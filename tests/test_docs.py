"""Executable documentation: every ```python fence in docs/*.md runs green.

The reference executes its Documenter doctests from inside the test suite
(/root/reference/test/common.jl:32-33) so documented examples cannot rot;
this is the same contract for the markdown docs here.  Blocks within one
file share a namespace (seeded by a small fixture preamble defining the
``A``/``b``/``dense`` symbols the prose introduces), so multi-block examples
compose exactly as a reader would run them.
"""

import os
import re

import pytest

DOCS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs")
BLOCK_RE = re.compile(r"```python\n(.*?)```", re.S)

# Symbols the docs prose introduces before the first fence uses them.
PREAMBLE = """
import jax
import jax.numpy as jnp
import numpy as np
import iterativesolvers_tpu as its
from iterativesolvers_tpu.utils.fixtures import laplace_dia

A = laplace_dia(16, 2, dtype=np.float64)     # n = 256: divides the 8-dev mesh
n = A.shape[0]
b = jnp.ones((n,), jnp.float64)
x_prev = jnp.zeros((n,), jnp.float64)
dense = np.asarray(A.to_dense())
"""


def _doc_files():
    return sorted(f for f in os.listdir(DOCS_DIR) if f.endswith(".md"))


@pytest.mark.parametrize("fname", _doc_files())
def test_docs_python_blocks(fname):
    with open(os.path.join(DOCS_DIR, fname)) as f:
        blocks = BLOCK_RE.findall(f.read())
    if not blocks:
        pytest.skip(f"{fname} has no python fences")
    ns: dict = {}
    exec(compile(PREAMBLE, f"{fname}:<preamble>", "exec"), ns)
    for i, block in enumerate(blocks):
        code = compile(block, f"docs/{fname}:block{i}", "exec")
        exec(code, ns)
