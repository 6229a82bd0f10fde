"""Flip-test alignment ops (reference deep_hrnet/lib/utils/transforms.py).

The reference runs a second forward pass on a width-flipped batch and fixes
the output up on the host with numpy (``flip_back`` :15-29,
``flip_back_offset`` :31-47).  Here these are pure channel-permute +
width-reverse array ops that live *inside* the jit graph, so flip-test is
"fold the flipped batch in, one forward, permute" with zero host traffic.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def flip_pair_permutation(num_joints, flip_pairs):
    """Joint permutation that swaps left/right pairs; identity elsewhere."""
    perm = np.arange(num_joints)
    for a, b in flip_pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return perm


def flip_back(output_flipped, flip_pairs):
    """Un-flip heatmaps from a flipped forward pass (transforms.py:15-29).

    output_flipped: (B, J, H, W).  Width-reverse, then swap paired channels.
    """
    J = output_flipped.shape[1]
    perm = flip_pair_permutation(J, flip_pairs)
    return output_flipped[:, perm, :, ::-1]


def flip_back_offset(output_flipped, flip_pairs):
    """Un-flip interleaved [hm, off_x, off_y] maps (transforms.py:31-47).

    output_flipped: (B, 3J, H, W).  Width-reverse, negate off_x channels,
    then swap joint triplets of paired joints.
    """
    B, C, H, W = output_flipped.shape
    J = C // 3
    out = output_flipped[:, :, :, ::-1]
    sign = np.ones((C,), np.float32)
    sign[1::3] = -1.0
    out = out * jnp.asarray(sign)[None, :, None, None]
    perm = flip_pair_permutation(J, flip_pairs)
    out = out.reshape(B, J, 3, H, W)[:, perm].reshape(B, C, H, W)
    return out


def fliplr_joints(joints, joints_vis, width, flip_pairs):
    """Horizontally flip source-space joints (transforms.py:50-64).

    joints (J, K≥2) with x in column 0; returns (joints*vis, vis) with
    left/right rows swapped — matching the reference's zeroing of invisible
    joints on flip.
    """
    J = joints.shape[0]
    perm = flip_pair_permutation(J, flip_pairs)
    joints = joints.at[:, 0].set(width - joints[:, 0] - 1)
    joints = joints[perm]
    joints_vis = joints_vis[perm]
    return joints * joints_vis, joints_vis


def fliplr_joints_np(joints, joints_vis, width, flip_pairs):
    """numpy twin of :func:`fliplr_joints` for host data pipelines."""
    joints = np.array(joints, copy=True)
    joints_vis = np.array(joints_vis, copy=True)
    perm = flip_pair_permutation(joints.shape[0], flip_pairs)
    joints[:, 0] = width - joints[:, 0] - 1
    joints = joints[perm]
    joints_vis = joints_vis[perm]
    return joints * joints_vis, joints_vis
