from .muscle_kernel import rigid_tendon_force_pallas

__all__ = ["rigid_tendon_force_pallas"]
