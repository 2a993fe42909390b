"""Global configuration for opensim-moco-tpu.

The framework is dtype-parametric: solver-grade accuracy (IPOPT-class
tolerances, cf. reference Moco/Moco/MocoInverse.cpp:38-39 using 1e-3) needs
float64, which JAX provides on CPU natively and on TPU via emulation. Hot
batched production solves can run float32 with iterative refinement.

Nothing here mutates global JAX state on import; call :func:`use_x64`
explicitly (tests do this in conftest.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def use_x64(enable: bool = True) -> None:
    """Enable 64-bit mode globally (recommended on CPU; emulated on TPU)."""
    jax.config.update("jax_enable_x64", enable)


def default_dtype():
    """The working dtype: float64 when x64 is enabled, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def is_x64() -> bool:
    return bool(jax.config.jax_enable_x64)
