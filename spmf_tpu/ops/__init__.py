from .fused_poisson import fused_poisson_loglik, poisson_loglik_reference

__all__ = ["fused_poisson_loglik", "poisson_loglik_reference"]
