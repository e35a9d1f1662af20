"""curriculum_learning_for_vln_tpu — a TPU-native Curriculum-Learning-for-VLN framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
IMNearth/Curriculum-Learning-For-VLN (NeurIPS 2021): Room-to-Room
vision-and-language navigation agents (Speaker-Follower, Self-Monitoring,
EnvDrop), curriculum training (naive rounds + self-paced SPCL), speaker /
back-translation, beam search, and the full R2R evaluation suite —
re-architected so the entire episode rollout runs as one jitted program on
device (packed world tables + lax.scan) instead of a host-driven simulator
loop.
"""

__version__ = "0.1.0"
