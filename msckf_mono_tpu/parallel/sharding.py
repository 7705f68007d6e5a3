"""Mesh sharding of the filter batch.

The reference is strictly single-threaded (SURVEY.md §2.5); the TPU-native
scale-out axis is the *batch of independent filters* (Monte-Carlo perturbations
x sequences x parameter grids). Filters shard over a 1-D ``filters`` mesh axis
— ICI within a slice, DCN across hosts — and the only communication is metric
reduction (``psum``/means), the TPU analogue of the NCCL layer the reference
never had. XLA inserts those collectives from the sharding annotations; nothing
here hand-schedules transfers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msckf_mono_tpu.core import filter as msckf_filter
from msckf_mono_tpu.utils.config import MsckfConfig

FILTER_AXIS = "filters"


def make_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    import numpy as np

    return Mesh(np.asarray(devices), (FILTER_AXIS,))


def shard_batch(tree, mesh: Mesh):
    """Place a leading-batch pytree with the batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(FILTER_AXIS))
    return jax.device_put(tree, sharding)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def batched_step(config: MsckfConfig):
    """vmapped frame step; under jit with sharded inputs this runs SPMD."""

    def step(states, frames):
        return jax.vmap(lambda s, f: msckf_filter.step(s, f, config))(states, frames)

    return step


def batched_run_sequence(config: MsckfConfig):
    """(B,)-batched filters through (T, B, ...) frame stacks."""

    def run(states, frames):
        return jax.vmap(
            lambda s, f: msckf_filter.run_sequence(s, f, config),
            in_axes=(0, 1),
            out_axes=(0, 1),
        )(states, frames)

    return run


def fleet_metrics(states, mesh: Mesh | None = None):
    """Cross-filter summary statistics via collectives.

    Returns a dict of replicated scalars. Under jit with a sharded batch the
    means/maxima lower to ICI/DCN all-reduces.
    """
    pos_cov_trace = jnp.trace(states.P[..., 12:15, 12:15], axis1=-2, axis2=-1)
    return {
        "mean_pos_cov_trace": jnp.mean(pos_cov_trace),
        "max_pos_cov_trace": jnp.max(pos_cov_trace),
        "mean_cam_count": jnp.mean(states.window.count.astype(jnp.float32)),
        "total_residualized": jnp.sum(states.num_residualized),
        "total_row_overflow": jnp.sum(states.diag.row_overflow),
        "total_staged_overflow": jnp.sum(states.diag.staged_overflow),
    }


def make_sharded_run(config: MsckfConfig, mesh: Mesh):
    """jit-compiled sharded fleet runner: states (B,...), frames (T,B,...).

    Returns (final_states, outputs, metrics) with metrics replicated.
    """
    run = batched_run_sequence(config)
    batch_sharding = NamedSharding(mesh, P(FILTER_AXIS))
    frame_sharding = NamedSharding(mesh, P(None, FILTER_AXIS))

    @partial(
        jax.jit,
        in_shardings=(batch_sharding, frame_sharding),
    )
    def fleet_run(states, frames):
        final, outs = run(states, frames)
        metrics = fleet_metrics(final)
        return final, outs, metrics

    return fleet_run
