from .goals import (AverageSpeedGoal, ControlGoal, CustomGoal, FinalTimeGoal,
                    Goal, InitialActivationGoal, MarkerFinalGoal,
                    PeriodicityGoal, StateTrackingGoal, SumSquaredStateGoal)
from .problem import (ParameterSpec, PathConstraintSpec, Problem, ProblemRep,
                      VariableInfo)
from .study import Study

__all__ = [
    "Goal", "ControlGoal", "FinalTimeGoal", "StateTrackingGoal",
    "SumSquaredStateGoal", "MarkerFinalGoal", "PeriodicityGoal",
    "InitialActivationGoal", "AverageSpeedGoal", "CustomGoal",
    "Problem", "ProblemRep", "VariableInfo", "PathConstraintSpec",
    "ParameterSpec", "Study",
]
