"""Device-resident MPC share vectors vs the host fabric golden model."""

import random
import threading

import numpy as np
import pytest

from mpc_bulletproof_tpu import Scalar
from mpc_bulletproof_tpu.ops import limb
from mpc_bulletproof_tpu.ops.field import inner_product
from mpc_bulletproof_tpu.parallel.beaver import PartyIdBeaverSource
from mpc_bulletproof_tpu.parallel.device_shares import DeviceShareVector
from mpc_bulletproof_tpu.parallel.fabric import MpcFabric
from mpc_bulletproof_tpu.parallel.network import make_local_pair
from mpc_bulletproof_tpu.utils.errors import AuthenticationError

rng = random.Random(90210)


def rand_scalar():
    return Scalar(rng.getrandbits(260))


def run_two_parties(fn):
    net0, net1 = make_local_pair()
    fabrics = [
        MpcFabric(net0, PartyIdBeaverSource(0)),
        MpcFabric(net1, PartyIdBeaverSource(1)),
    ]
    results = [None, None]
    errors = [None, None]

    def runner(i):
        try:
            results[i] = fn(fabrics[i])
        except Exception as exc:  # noqa: BLE001
            errors[i] = exc

    threads = [threading.Thread(target=runner, args=(i,)) for i in (0, 1)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    for err in errors:
        if err is not None:
            raise err
    return results


def _opened_ints(limbs_arr):
    return limb.limbs_to_ints(np.asarray(limbs_arr))


def test_device_share_roundtrip_and_open():
    values = [rand_scalar() for _ in range(6)]

    def fn(fabric):
        host_vec = fabric.batch_share_scalars(
            values if fabric.party_id == 0 else None, 0, count=6
        )
        dev = DeviceShareVector.from_host(host_vec)
        assert dev.to_host().shares == host_vec.shares
        return _opened_ints(dev.open_authenticated())

    r0, r1 = run_two_parties(fn)
    assert r0 == [int(v) for v in values] == r1


def test_device_linear_ops_and_beaver():
    xs = [rand_scalar() for _ in range(5)]
    ys = [rand_scalar() for _ in range(5)]

    def fn(fabric):
        x = DeviceShareVector.from_host(
            fabric.batch_share_scalars(xs if fabric.party_id == 0 else None, 0, count=5)
        )
        y = DeviceShareVector.from_host(
            fabric.batch_share_scalars(ys if fabric.party_id == 1 else None, 1, count=5)
        )
        combo = (x + y).mul_public(Scalar(5)).add_public([Scalar(3)] * 5) - y
        combo_open = _opened_ints(combo.open_authenticated())
        prod = x.beaver_mul(y)
        prod_open = _opened_ints(prod.open_authenticated())
        ip = x.inner_product(y)
        ip_open = _opened_ints(ip.open_authenticated())[0]
        return combo_open, prod_open, ip_open

    (c0, p0, i0), (c1, p1, i1) = run_two_parties(fn)
    expect_combo = [int((a + b) * Scalar(5) + Scalar(3) - b) for a, b in zip(xs, ys)]
    expect_prod = [int(a * b) for a, b in zip(xs, ys)]
    expect_ip = int(inner_product(xs, ys))
    assert c0 == expect_combo == c1
    assert p0 == expect_prod == p1
    assert i0 == expect_ip == i1


def test_device_mac_check_detects_tampering():
    def fn(fabric):
        vec = DeviceShareVector.from_host(
            fabric.batch_share_scalars(
                [Scalar(99)] if fabric.party_id == 0 else None, 0, count=1
            )
        )
        if fabric.party_id == 0:
            import jax.numpy as jnp

            tampered = vec.shares.at[0, 0].add(1)
            vec = DeviceShareVector(fabric, tampered, vec.macs)
        with pytest.raises(AuthenticationError):
            vec.open_authenticated()
        return True

    assert run_two_parties(fn) == [True, True]
