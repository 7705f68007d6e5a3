"""Checkpoint/resume round-trip (VERDICT item 4c — never executed in round 1).

Saves a sharded fleet mid-sequence with orbax, restores it, resumes the
remaining frames, and asserts the final state is identical to the
uninterrupted run.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msckf_mono_tpu.core.init import ground_truth_init
from msckf_mono_tpu.data import synthetic
from msckf_mono_tpu.parallel import checkpoint, montecarlo, sharding
from msckf_mono_tpu.utils.config import MsckfConfig

CFG = MsckfConfig()
BATCH = 8
FRAMES = 8


def _half(tree, lo, hi):
    return jax.tree_util.tree_map(lambda x: x[:, lo:hi], tree)


def test_checkpoint_resume_identical(tmp_path):
    seq = synthetic.generate(CFG, n_frames=FRAMES, seed=0, pixel_noise=0.5)
    frames = synthetic.to_frame_inputs(seq, jnp.float32)
    imu = ground_truth_init(
        p_I_G=[5.0, 0.0, 0.0], q_IG=[1, 0, 0, 0],
        v_I_G=[0.0, 5.0 * 0.35, 0.28], b_g=seq.b_g, b_a=seq.b_a,
        dtype=jnp.float32,
    )
    states = montecarlo.make_fleet(CFG, imu, BATCH, dtype=jnp.float32)
    bframes = montecarlo.broadcast_frames(frames, BATCH)
    first = jax.tree_util.tree_map(lambda x: x[: FRAMES // 2], bframes)
    second = jax.tree_util.tree_map(lambda x: x[FRAMES // 2 :], bframes)

    mesh = sharding.make_mesh()
    run = sharding.make_sharded_run(CFG, mesh)
    states = sharding.shard_batch(states, mesh)

    # uninterrupted run
    final_ref, _, _ = run(states, bframes)

    # run half, checkpoint, restore into a fresh template, resume
    mid, _, _ = run(states, first)
    path = checkpoint.save(str(tmp_path / "ckpt"), mid, step=FRAMES // 2)

    template = jax.tree_util.tree_map(np.zeros_like, mid)
    restored = checkpoint.restore(path, template)
    restored = sharding.shard_batch(restored, mesh)

    # restored state is bit-identical to the state it snapshot
    for a, b in zip(jax.tree_util.tree_leaves(mid), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    final_resumed, _, _ = run(restored, second)
    np.testing.assert_array_equal(
        np.asarray(final_ref.P), np.asarray(final_resumed.P)
    )
    np.testing.assert_array_equal(
        np.asarray(final_ref.imu.p_I_G), np.asarray(final_resumed.imu.p_I_G)
    )
    assert np.array_equal(
        np.asarray(final_ref.diag.updates_applied),
        np.asarray(final_resumed.diag.updates_applied),
    )
