"""Device mesh + sharding helpers.

The reference has no distributed support of any kind (SURVEY.md section 2.9:
no tf.distribute, no collectives). This module is the new TPU-native
capability mandated by BASELINE.json: a ``jax.sharding.Mesh`` over ICI (and
DCN-ready for multi-host), batch-sharded data parallelism with XLA-compiled
gradient all-reduce, and replicated parameters.

Axes:
  * ``data``  — batch sharding (data parallel over ICI).
  * ``model`` — reserved for tensor-parallel sharding of the big encoder
    flatten->dense / decoder dense matmuls (the only >MXU-tile weights in
    this model family).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (jax.distributed) for DCN-spanning meshes.

    With no arguments, reads the standard cluster env (JAX auto-detects on
    Cloud TPU pods). After this, ``make_mesh`` over ``jax.devices()`` yields a
    DCN-major device order, so the 'data' axis spans hosts (gradient
    all-reduce hierarchically: ICI within a host's slice, DCN across) while
    'model' stays within a slice. Safe to call once per process.
    """
    import os

    import jax

    # NOTE: must run before anything initializes the XLA backend — even
    # jax.process_count()/jax.devices() would spoil it.
    # shutdown_timeout_seconds: the coordination-service SHUTDOWN barrier.
    # The default (300 s) is tight when the primary does post-train work
    # (metrics flush, artifact writes) on a loaded host while the workers
    # already sit at the exit barrier — a successful run then dies with
    # DEADLINE_EXCEEDED at teardown. Raised by default; overridable.
    kwargs = {"shutdown_timeout_seconds":
              int(os.environ.get("TCVAE_SHUTDOWN_TIMEOUT_S", "900"))}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        msg = str(e).lower()
        # jax 0.9: "distributed.initialize should only be called once."
        if "already" in msg or "once" in msg or "only be called" in msg:
            return  # initialized earlier in this process: fine
        # single-process run (no cluster env): fine; backend-already-up is NOT
        if "backend" in msg or "xla" in msg:
            raise RuntimeError(
                "initialize_distributed() must be called before any JAX "
                "computation/device query initializes the backend"
            ) from e
        print(f"jax.distributed not initialized ({e}); running single-process")


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh over the local devices.

    Defaults to all local devices on the data axis — the right layout for
    this model family (small CNN, gradient all-reduce rides ICI).
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh.

    Footgun: jax.device_put may ALIAS the source buffers (device 0's replica
    reuses them on a single host), so donating the replicated tree to a
    jitted step also invalidates the source tree. Treat the input as consumed
    when the output feeds a donating step.
    """
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)


def global_batch_from_local(local_batch, mesh: Mesh):
    """Assemble a multi-process global batch from this process's local shard.

    Multi-host path (after initialize_distributed): each host feeds only the
    rows its local devices own (per-host sharded ingest); the returned global
    array is batch-sharded over the 'data' axis. On a single process this is
    equivalent to shard_batch(local_batch, mesh, pad=False).
    """
    local_batch = np.asarray(local_batch)
    return jax.make_array_from_process_local_data(batch_sharding(mesh), local_batch)


def replicated_from_local(tree, mesh: Mesh):
    """Replicate host-local values over a (possibly multi-process) mesh.

    Unlike ``replicate`` (device_put), this works when the mesh spans
    non-addressable devices: every process must pass identical values.
    """
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)), tree
    )


def distributed_teardown(tag: str = "tcvae_exit") -> None:
    """Tolerant end-of-job teardown for multi-host runs.

    Two failure shapes turn a SUCCESSFUL run into nonzero exits on every
    worker (observed in-suite on a contended host, VERDICT r4 #7):
      * skew — the primary still flushing metrics/artifacts while workers
        already hit the interpreter-exit shutdown barrier (fixed-timeout
        DEADLINE_EXCEEDED on the coordination service);
      * a shutdown-barrier error escaping at teardown after the checkpoint
        and sidecar are already durable.
    So: (1) explicitly synchronize ALL processes after the last real work,
    then (2) shut the coordination service down here (not at interpreter
    exit), swallowing teardown-only errors — by this point everything the
    job produced is on disk, and a teardown hiccup must not fail the job.
    No-op single-process.
    """
    import jax

    if jax.process_count() <= 1:
        return
    try:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)
    except Exception as e:  # noqa: BLE001 — teardown must not fail the job
        print(f"WARNING: exit sync failed ({e}); proceeding to shutdown")
    try:
        jax.distributed.shutdown()
    except Exception as e:  # noqa: BLE001
        print(f"WARNING: distributed shutdown failed ({e}); outputs are "
              "durable — exiting cleanly anyway")


def broadcast_str(s: str, max_len: int = 512) -> str:
    """Broadcast a (short) string from process 0 to every process.

    Used for run-scoped paths that must be identical job-wide (the stamped
    logdir). Identity on a single process."""
    import jax

    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len + 1, np.uint8)
    b = s.encode("utf-8")
    assert len(b) <= max_len, f"broadcast_str: {len(b)} > {max_len} bytes"
    buf[0] = 1  # sentinel so an all-zero payload still decodes as ""
    buf[1 : 1 + len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    payload = bytes(out[1:])
    return payload.rstrip(b"\x00").decode("utf-8")


_pad_warned = False


def shard_batch(batch, mesh: Mesh, pad: bool = True):
    """Device_put a host batch with leading-axis sharding; optionally pad the
    batch up to a multiple of the data-axis size (repeating the last row).

    Semantic caveat (vs the reference's exact single-device batch
    reductions): padded rows are REAL duplicated frames that enter the
    MSE/moment statistics, slightly biasing the loss of an epoch-final ragged
    batch toward the repeated frame. This only affects remainder batches
    (at most (n_data-1) duplicated rows); a warning is printed the first time
    it happens. Size batches as a multiple of the data-axis (or drop the
    remainder batch) when exact parity matters.
    """
    global _pad_warned
    batch = np.asarray(batch)
    n_data = mesh.shape[DATA_AXIS]
    if pad and batch.shape[0] % n_data != 0:
        extra = n_data - (batch.shape[0] % n_data)
        if not _pad_warned:
            print(
                f"shard_batch: padding ragged batch {batch.shape[0]} -> "
                f"{batch.shape[0] + extra} by repeating the last frame "
                f"(biases this batch's loss stats; size batches as a multiple "
                f"of data={n_data} for exact parity)"
            )
            _pad_warned = True
        batch = np.concatenate([batch, np.repeat(batch[-1:], extra, axis=0)], axis=0)
    return jax.device_put(batch, batch_sharding(mesh))
