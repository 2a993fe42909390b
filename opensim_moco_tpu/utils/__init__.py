from .rollout import rollout, time_stepping_guess
from .tables import (StoTable, TrcTable, read_sto, read_trc,
                     sto_to_trajectory, trajectory_to_sto, write_sto)
from .trajectory import SealedSolutionError, Solution, Trajectory

__all__ = [
    "Trajectory", "Solution", "SealedSolutionError",
    "StoTable", "read_sto", "write_sto", "trajectory_to_sto",
    "sto_to_trajectory", "TrcTable", "read_trc",
    "rollout", "time_stepping_guess",
]
