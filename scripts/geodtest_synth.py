"""Run the 500k synthetic GeodTest-scale conformance sweep and print
one JSON line (kernels/conformance.py; the sandbox substitute for the
official GeodTest.dat mass harness, ref geodtest/geod_test.go:18-99 —
scripts/geodtest.py still runs the real file when GEODTEST_DAT_PATH
is set).

Usage: python scripts/geodtest_synth.py [n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geographiclib_go_spark.kernels import conformance as cf  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    t0 = time.time()
    r = cf.run_sweep(n=n)
    r["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(r))
    return 0 if r["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
