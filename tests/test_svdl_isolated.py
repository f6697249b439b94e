"""svdl tests, run in an isolated interpreter.

The in-process suite segfaults inside XLA-CPU when svdl's compiles land
after ~370 accumulated test compilations (BENCH_NOTES r4/r5: the crash
follows the global test COUNT — round 4 hit the GradientOperator case,
round 5 hit dense parity after ~15 new tests shifted the order; every
svdl test passes standalone).  Running the whole module in a fresh
interpreter removes the order dependence without losing coverage:
the real tests live in tests/isolated/test_svdl.py.
"""

import os
import subprocess
import sys


def test_svdl_suite_in_fresh_interpreter():
    suite = os.path.join(os.path.dirname(__file__), "isolated",
                         "test_svdl.py")
    out = subprocess.run(
        [sys.executable, "-m", "pytest", suite, "-q", "--no-header", "-p",
         "no:cacheprovider"],
        capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-4000:]
