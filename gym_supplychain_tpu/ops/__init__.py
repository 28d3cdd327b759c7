"""Hand-written TPU kernels (Pallas).

The simulation engines in ``core/`` compile to fused XLA While-loops that
already run at ~0.1-0.3 us per step (docs/PERFORMANCE.md) — XLA's fusion is
the right tool for those bodies, so the default compute path is plain
jax.numpy.  This package holds the Pallas implementations we maintain for
the cases where manual control wins (whole-episode fusion with on-chip
state, see ``beergame_pallas``) together with their parity tests and
benchmarks, so the XLA-vs-Pallas tradeoff stays measured rather than
assumed.
"""
