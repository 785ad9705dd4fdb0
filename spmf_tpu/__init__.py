"""spmf_tpu — TPU-native sparse probabilistic matrix factorization.

A ground-up JAX/XLA/Pallas rebuild of mederrata/spmf (and the external
``bayesianquilts`` inference engine it depends on), designed TPU-first:
jitted minibatch ADVI, mesh-sharded batches/parameters, Pallas kernels for
the fused Poisson-likelihood hot path.
"""

__version__ = "0.1.0"

from spmf_tpu import bijectors, distributions  # noqa: F401

__all__ = ["distributions", "bijectors", "__version__"]
