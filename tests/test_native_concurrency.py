"""Concurrent use of the native core from multiple threads.

Regression for a WorkPool race: two application threads issuing pool-sized
MSMs concurrently (exactly what the two in-process MPC parties do since
``fabric.shared_msm`` routes through ``dispatch_msm``) clobbered each
other's batch state — wrong MSM results (surfacing as MAC-check failures
in the collaborative prover) or a lost completion signal that parked both
parties forever.  ``WorkPool::run`` now serializes whole batches.

Reference analogue: the rayon pool the reference leans on
(src/inner_product_proof.rs:26) is safe under concurrent scope entry; ours
must be too.
"""

from __future__ import annotations

import random
import threading

import pytest

from mpc_bulletproof_tpu.ops.curve import StarkPoint
from mpc_bulletproof_tpu.ops.field import Scalar
from mpc_bulletproof_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native core not built"
)


def test_concurrent_msm_matches_serial():
    rng = random.Random(99)
    n = 1500  # large enough that bp_msm fans out onto the pool
    g = StarkPoint.generator()
    jobs = []
    for _ in range(4):
        scalars = [Scalar(rng.getrandbits(252)) for _ in range(n)]
        points = [g.scalar_mul(Scalar(rng.getrandbits(64) | 1)) for _ in range(n)]
        jobs.append((scalars, points))

    expected = [native.msm(s, p) for s, p in jobs]

    results = [[None, None] for _ in jobs]
    errors = []

    def worker(tid):
        try:
            for j, (s, p) in enumerate(jobs):
                results[j][tid] = native.msm(s, p)
        except Exception as exc:  # pragma: no cover - failure path
            errors.append(exc)

    # Two threads race the same job sequence; a third hammers small MSMs
    # (the serial path) to mix pool and non-pool callers.
    def small(tid):
        try:
            s, p = jobs[0]
            for _ in range(8):
                native.msm(s[:8], p[:8])
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [
        threading.Thread(target=worker, args=(0,)),
        threading.Thread(target=worker, args=(1,)),
        threading.Thread(target=small, args=(2,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "native msm deadlocked under concurrency"
    assert not errors, errors
    for j, exp in enumerate(expected):
        assert results[j][0] == exp
        assert results[j][1] == exp
