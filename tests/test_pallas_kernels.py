"""Pallas decode kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

from udp_pose_tpu.ops import decode
from udp_pose_tpu.ops.pallas.decode_kernels import (fused_peak_offset,
                                                    udp_offset_decode_pallas)


def _peaky(rng, N=6, H=64, W=48):
    maps = rng.uniform(0, 0.1, (N, H, W)).astype(np.float32)
    ys, xs = np.mgrid[0:H, 0:W]
    for i in range(N):
        cy, cx = rng.uniform(4, H - 4), rng.uniform(4, W - 4)
        maps[i] += np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / 8.0).astype(np.float32)
    return maps


def test_fused_peak_offset_matches_numpy():
    rng = np.random.default_rng(130)
    hm = _peaky(rng)
    ox = rng.normal(size=hm.shape).astype(np.float32)
    oy = rng.normal(size=hm.shape).astype(np.float32)
    out = np.asarray(fused_peak_offset(hm, ox, oy, interpret=True))
    N, H, W = hm.shape
    flat = hm.reshape(N, -1)
    idx = flat.argmax(1)
    np.testing.assert_array_equal(out[:, 0], (idx % W).astype(np.float32))
    np.testing.assert_array_equal(out[:, 1], (idx // W).astype(np.float32))
    np.testing.assert_allclose(out[:, 2], flat.max(1), rtol=1e-6)
    np.testing.assert_allclose(out[:, 3], ox.reshape(N, -1)[np.arange(N), idx],
                               rtol=1e-5)
    np.testing.assert_allclose(out[:, 4], oy.reshape(N, -1)[np.arange(N), idx],
                               rtol=1e-5)


def test_udp_offset_decode_pallas_matches_xla_path():
    rng = np.random.default_rng(131)
    B, J, H, W = 2, 3, 64, 48
    net = rng.uniform(-0.5, 0.5, (B, 3 * J, H, W)).astype(np.float32)
    net[:, 0::3] = _peaky(rng, B * J, H, W).reshape(B, J, H, W)
    gold_c, gold_v = decode.udp_offset_decode(net, 4.0)
    c, v = udp_offset_decode_pallas(net, 4.0, interpret=True)
    np.testing.assert_allclose(np.asarray(v), np.asarray(gold_v), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(gold_c),
                               rtol=1e-4, atol=1e-4)
