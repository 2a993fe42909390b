from .goals import (AccelerationTrackingGoal, AngularVelocityTrackingGoal,
                    AverageSpeedGoal, ContactTrackingGoal, ControlGoal,
                    ControlTrackingGoal, CustomGoal, FinalTimeGoal, Goal,
                    InitialActivationGoal, InitialForceEquilibriumGoal,
                    InitialVelocityEquilibriumDGFGoal, JointReactionGoal,
                    MarkerFinalGoal, MarkerTrackingGoal,
                    OrientationTrackingGoal, OutputGoal, PeriodicityGoal,
                    StateTrackingGoal, SumSquaredStateGoal,
                    TranslationTrackingGoal)
from .path_constraints import (control_bound_constraint,
                               frame_distance_constraint)
from .problem import (ParameterSpec, PathConstraintSpec, Problem, ProblemRep,
                      VariableInfo)
from .study import Study

__all__ = [
    "Goal", "ControlGoal", "FinalTimeGoal", "StateTrackingGoal",
    "SumSquaredStateGoal", "MarkerFinalGoal", "PeriodicityGoal",
    "InitialActivationGoal", "AverageSpeedGoal", "CustomGoal",
    "MarkerTrackingGoal", "ControlTrackingGoal", "TranslationTrackingGoal",
    "OrientationTrackingGoal", "AngularVelocityTrackingGoal", "OutputGoal",
    "InitialForceEquilibriumGoal", "ContactTrackingGoal",
    "AccelerationTrackingGoal", "JointReactionGoal",
    "InitialVelocityEquilibriumDGFGoal",
    "control_bound_constraint", "frame_distance_constraint",
    "Problem", "ProblemRep", "VariableInfo", "PathConstraintSpec",
    "ParameterSpec", "Study",
]
