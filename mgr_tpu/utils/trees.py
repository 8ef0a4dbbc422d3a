"""Pytree helpers used across training/metrics/tests."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def tree_count_params(tree: Any) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree)
               if hasattr(x, "shape"))


def tree_norm(tree: Any) -> jax.Array:
    """Global L2 norm of all leaves."""
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32)))
              for x in jax.tree.leaves(tree) if hasattr(x, "shape")]
    return jnp.sqrt(sum(leaves)) if leaves else jnp.zeros(())


def tree_equal(a: Any, b: Any) -> bool:
    """Exact structural + value equality of two pytrees (host-side)."""
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    if ta != tb or len(la) != len(lb):
        return False
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))
