"""TPU-native N-body geometric-deep-learning benchmark framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
repo ``Extending-the-N-body-Benchmark`` (PyTorch, single GPU).  Everything is
built dense-first for the TPU MXU: graphs are ``[B, N, N]`` masked tensors,
physics datagen is ``vmap(lax.scan(leapfrog))``, rollout is a single jitted
``lax.scan`` and multi-chip scaling rides a ``jax.sharding.Mesh``.

Subpackages
-----------
core        Scene struct, leapfrog physics, dense graph geometry.
models      The 7 surrogate model families (flax.linen, dense formulation).
ops         Low-level kernels incl. Pallas TPU kernels for the hot paths.
data        On-the-fly gravity dataset (device-resident trajectory queue).
train       Jitted trainer, losses, LR schedules, checkpointing, logging.
rollout     Self-feed autoregressive rollout as one ``lax.scan``.
metrics     Macro-property kernels + KS/Fisher statistical scoring.
parallel    Device mesh, shardings, multi-chip train/rollout.
utils       Config system (YAML + dot-override CLI), run-dir management.
evaluation  Post-hoc KS checkpoint ranking (ks_test equivalent).
hpo         Hyper-parameter optimisation with param-budget matching.
viz         Trajectory / macro plotting.

Import alias convention used throughout the docs and tests::

    import extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu as nbx
"""

__version__ = "0.1.0"

# Short, stable aliases for the subpackages (lazy — keep import light).
from . import core  # noqa: F401
