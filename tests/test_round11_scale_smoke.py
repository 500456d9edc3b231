"""Round-11 scale smoke: the batch-E two-sample statistics at 3M rows.

At N = 3e6 the doubled-rank square sums reach ~1e20 (cucconi s2d,
fligner dsp2 ~ 4N^3) and lepage's asq256 ~ 64N^3 ~ 1.7e21 — all beyond
2^63, which pre-widening BIGINT arithmetic could not represent (ANSI
Spark would throw on overflow). The synthetic frame has 1000 distinct
values, so an exact python-bignum replica runs over the tiny histogram
while Spark aggregates the full 3M rows; the final doubles must agree
to the same 6dp the oracles pin (round-10 TestCvmScaleSmoke pattern,
tests/test_round10_ops.py:881)."""

from __future__ import annotations

import math
import os

import pytest

from eventstreamml_spark import queries as q

pytestmark = pytest.mark.slow  # 3M-row overflow smokes (~minutes each)

N = 3_000_000


@pytest.fixture(scope="module")
def smoke_dir(tmp_path_factory):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pandas as pd

    d = tmp_path_factory.mktemp("r11smoke")
    ids = np.arange(N, dtype=np.int64)
    vm = (ids * ids) % 1000
    table = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(
                [pd.Timestamp("2024-01-01")] * N, pa.timestamp("us")
            ),
            "user_id": pa.array(ids, pa.int64()),
            "event_type": pa.array(["click"] * N, pa.string()),
            "value": pa.array(vm.astype("float64"), pa.float64()),
            "props": pa.array(["{}"] * N, pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    return str(d)


def _hist():
    """Exact (milli-value -> (c1, c0)) histogram of the synthetic frame,
    computed with python bignums from the id -> ((id*id) % 1000, id % 2)
    construction."""
    import numpy as np

    ids = np.arange(N, dtype=np.int64)
    vm = (ids * ids) % 1000
    arm = ids % 2
    c1 = np.bincount(vm[arm == 1], minlength=1000)
    c0 = np.bincount(vm[arm == 0], minlength=1000)
    return [
        (int(v) * 1000, int(c1[v]), int(c0[v]))
        for v in range(1000)
        if c1[v] or c0[v]
    ]


def test_cucconi_3m_matches_bignum_replica(spark, smoke_dir):
    hist = sorted(_hist())
    nt = sum(a + b for _, a, b in hist)
    n1 = sum(a for _, a, _ in hist)
    n0 = nt - n1
    cb = 0
    s2d = r2d = 0
    for _, c1, c0 in hist:
        t = c1 + c0
        dr = 2 * cb + t + 1
        s2d += c1 * dr * dr
        r2d += c1 * (2 * nt + 2 - dr) * (2 * nt + 2 - dr)
        cb += t
    assert max(3 * s2d, 3 * r2d) > 2**63  # the smoke's reason to exist
    u_num = 3 * s2d - 2 * n1 * (nt + 1) * (2 * nt + 1)
    v_num = 3 * r2d - 2 * n1 * (nt + 1) * (2 * nt + 1)
    den = 2.0 * math.sqrt(
        float(n1) * n0 * (nt + 1) * (2 * nt + 1) * (8 * nt + 11) / 5.0
    )
    u, v = float(u_num) / den, float(v_num) / den
    rho = 2.0 * (float(nt) * nt - 4) / ((2.0 * nt + 1) * (8 * nt + 11)) - 1.0
    c = (u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho))
    r = q.queries()["cucconi_test_arms"](spark, smoke_dir).collect()[0]
    assert (r["n0"], r["n1"]) == (n0, n1)
    assert r["cucconi_u"] == pytest.approx(u, abs=2e-6)
    assert r["cucconi_v"] == pytest.approx(v, abs=2e-6)
    assert r["cucconi_c"] == pytest.approx(c, abs=2e-6)


def test_lepage_3m_matches_bignum_replica(spark, smoke_dir):
    hist = sorted(_hist())
    nt = sum(a + b for _, a, b in hist)
    n1 = sum(a for _, a, _ in hist)
    n0 = nt - n1
    hf = (nt + 1) // 2

    def s2(k):  # doubled Ansari score prefix sum, closed form
        if k <= hf:
            return k * (k + 1)
        return 2 * hf * (hf + 1) + 2 * (k - hf) * (nt + 1) - k * (k + 1)

    cb = 0
    dw = tsum = a_micro = asq256 = 0
    for _, c1, c0 in hist:
        t = c1 + c0
        dw += c1 * (2 * cb + t + 1)
        tsum += t * t * t - t
        ds2 = s2(cb + t) - s2(cb)
        if c1 > 0:
            a_micro += math.floor(
                float(c1 * ds2) / (2 * t) * 1000000.0
            )
        asq256 += math.floor(
            float(ds2) * float(ds2) / (4.0 * t) * 256.0
        )
        cb += t
    assert asq256 > 2**63
    var_w = float(n0) * n1 / 12.0 * (
        (nt + 1) - float(tsum) / (float(nt) * (nt - 1))
    )
    z_w = (float(dw) - float(n1) * (nt + 1)) / (2.0 * math.sqrt(var_w))
    hf2 = (nt + 1) // 2
    t2 = 2 * hf2 * (hf2 + 1) + (nt + 1) * (nt - 2 * hf2)
    abar = float(t2) / (2.0 * nt)
    var_a = (
        float(n0) * n1 / (float(nt) * (nt - 1))
        * (float(asq256) / 256.0 - nt * abar * abar)
    )
    z_a = (float(a_micro) / 1000000.0 - float(n1) * abar) / math.sqrt(var_a)
    r = q.queries()["lepage_test_arms"](spark, smoke_dir).collect()[0]
    assert r["z_wilcoxon"] == pytest.approx(z_w, abs=2e-6)
    assert r["z_ansari"] == pytest.approx(z_a, abs=2e-6)
    assert r["lepage_d"] == pytest.approx(z_w**2 + z_a**2, abs=4e-6)


def test_fligner_policello_3m_matches_bignum_replica(spark, smoke_dir):
    hist = sorted(_hist())
    n1 = sum(a for _, a, _ in hist)
    n0 = sum(b for _, _, b in hist)
    cb0 = cb1 = 0
    dsp = dsq = dsp2 = dsq2 = 0
    for _, c1, c0 in hist:
        dp = 2 * cb0 + c0
        dq = 2 * cb1 + c1
        dsp += c1 * dp
        dsq += c0 * dq
        dsp2 += c1 * dp * dp
        dsq2 += c0 * dq * dq
        cb0 += c0
        cb1 += c1
    # placements are capped by the opposite arm (N/2), so at 3M rows
    # dsp2 ~ 5.2e18 sits just UNDER 2^63 — past half the BIGINT
    # headroom (a ~4.2M-row frame would overflow the pre-widening sum)
    assert max(dsp2, dsq2) > 2**62
    v1 = (float(dsp2) - float(dsp) * float(dsp) / n1) / 4.0
    v2 = (float(dsq2) - float(dsq) * float(dsq) / n0) / 4.0
    pbar = float(dsp) / (2.0 * n1)
    qbar = float(dsq) / (2.0 * n0)
    u = ((float(dsp) - float(dsq)) / 2.0) / (
        2.0 * math.sqrt(v1 + v2 + pbar * qbar)
    )
    r = q.queries()["fligner_policello_arms"](spark, smoke_dir).collect()[0]
    assert r["mean_placement_1"] == pytest.approx(pbar, abs=2e-6)
    assert r["mean_placement_0"] == pytest.approx(qbar, abs=2e-6)
    assert r["fp_u_hat"] == pytest.approx(u, abs=2e-6)
