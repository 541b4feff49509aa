"""rift_tpu — TPU-native closed-loop traffic simulation + RL fine-tuning.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CurryChen77/RIFT
(adversarial-but-realistic background traffic trained closed-loop with
group-relative policy optimisation). See DESIGN.md for the architecture and
SURVEY.md for the component map of the reference.
"""

__version__ = "0.1.0"
