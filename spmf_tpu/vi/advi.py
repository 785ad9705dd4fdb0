"""API-parity alias module.

The reference imports its surrogate builders from ``bayesianquilts.vi.advi``
(reference: mederrata_spmf/poisson.py:19-20); porting users can keep the
same import shape: ``from spmf_tpu.vi.advi import build_trainable_normal_dist``.
"""
from spmf_tpu.vi.surrogates import (  # noqa: F401
    SurrogatePosterior,
    TrainableInverseGamma,
    TrainableNormal,
    TransformedSurrogate,
    build_surrogate_posterior,
    build_trainable_InverseGamma_dist,
    build_trainable_normal_dist,
)

__all__ = [
    "build_trainable_normal_dist",
    "build_trainable_InverseGamma_dist",
    "build_surrogate_posterior",
    "TrainableNormal",
    "TrainableInverseGamma",
    "TransformedSurrogate",
    "SurrogatePosterior",
]
