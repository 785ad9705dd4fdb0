"""Named joint distributions with DAG dependencies.

Rebuild of ``tfd.JointDistributionNamed`` as used by the reference
(reference: mederrata_spmf/poisson.py:400-401): dict values are either
Distribution objects or callables whose *argument names* refer to other
entries in the dict (e.g. ``'u': lambda u_eta, u_tau: ...``,
poisson.py:247-251).
"""
from __future__ import annotations

import inspect

import jax

__all__ = ["JointDistributionNamed"]


class JointDistributionNamed:
    def __init__(self, model: dict):
        self.model = dict(model)
        self._deps = {}
        for name, node in self.model.items():
            if callable(node) and not hasattr(node, "log_prob"):
                self._deps[name] = tuple(
                    inspect.signature(node).parameters.keys()
                )
            else:
                self._deps[name] = ()
        self._order = self._toposort()

    def _toposort(self):
        order, seen = [], set()

        def visit(name, stack=()):
            if name in seen:
                return
            if name in stack:
                raise ValueError(f"Cycle in joint distribution at {name!r}")
            for dep in self._deps[name]:
                if dep in self.model:
                    visit(dep, stack + (name,))
            seen.add(name)
            order.append(name)

        for name in self.model:
            visit(name)
        return order

    @property
    def names(self):
        return list(self.model.keys())

    def _resolve(self, name, values):
        node = self.model[name]
        if callable(node) and not hasattr(node, "log_prob"):
            kwargs = {dep: values[dep] for dep in self._deps[name]}
            return node(**kwargs)
        return node

    def log_prob_parts(self, values: dict) -> dict:
        """Per-variable log-probs given a full assignment. Mirrors
        ``JointDistributionNamed.log_prob_parts`` (reference call site:
        poisson.py:590)."""
        return {
            name: self._resolve(name, values).log_prob(values[name])
            for name in self.model
        }

    def log_prob(self, values: dict):
        parts = self.log_prob_parts(values)
        out = 0.0
        for v in parts.values():
            out = out + v
        return out

    def sample(self, key, sample_shape=()) -> dict:
        values = {}
        keys = jax.random.split(key, len(self._order))
        for k, name in zip(keys, self._order):
            dist = self._resolve(name, values)
            # Dependent nodes inherit the sample dims through their parents'
            # values (their batch_shape already carries sample_shape), so only
            # root nodes get the explicit sample_shape — mirrors
            # tfd.JointDistributionNamed semantics.
            has_model_deps = any(d in self.model for d in self._deps[name])
            shape = () if has_model_deps else sample_shape
            values[name] = dist.sample(k, shape)
        return values
