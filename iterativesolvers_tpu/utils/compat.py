"""JAX API compatibility shims.

Single home for version-sensitive lax calls so an upstream rename is a
one-line fix here rather than a sweep of the kernel modules.
"""

from __future__ import annotations

import jax


def mark_varying(x, axes):
    """Mark ``x`` as varying over the mesh ``axes`` (shard_map vma system).

    JAX 0.9 deprecated ``jax.lax.pvary`` in favor of
    ``jax.lax.pcast(..., to='varying')``; older releases only have the
    former.  ``axes`` may be a name or a tuple of names.
    """
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axes, to="varying")
    return jax.lax.pvary(x, axes)
