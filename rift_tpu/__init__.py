"""rift_tpu — TPU-native closed-loop traffic simulation + RL fine-tuning.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CurryChen77/RIFT
(adversarial-but-realistic background traffic trained closed-loop with
group-relative policy optimisation). See DESIGN.md for the architecture and
SURVEY.md for the component map of the reference.
"""

__version__ = "0.1.0"

# CPU-backend escape hatch for subprocess smoke runs (ego_zoo --cpu):
# must land before ANY submodule import — module-level jnp constants
# (sim/dynamics.py polynomials) initialise the backend during import,
# after which jax_platforms is frozen.
import os as _os

if _os.environ.get("RIFT_TPU_FORCE_CPU") == "1":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
