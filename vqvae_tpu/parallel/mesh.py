"""Device mesh + sharding rules (SURVEY.md §2.3, §5.8).

The reference's only parallelism is single-node data-parallel NCCL
allreduce (Chainer ``MultiprocessParallelUpdater``).  The TPU-native
equivalent is zero user-visible communication code: a ``Mesh`` over
('data', 'model'), the batch sharded along 'data' via ``NamedSharding``,
parameters replicated (or channel-sharded along 'model'), and XLA
inserting the gradient ``psum`` over ICI automatically inside the
jit-compiled train step.

'model' is the optional tensor-parallel axis the reference never had:
stacked per-layer WaveNet weights are sharded along their *output*
channel axes and the codebook along K when divisible.  At mesh_model=1
every rule degenerates to replication, so the same jitted step serves
single-chip, pure-DP, and DP+TP without code changes.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, slices: int = 1,
              seq: int = 1,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a ('data', 'model') mesh — optionally with a 'slice'
    (multi-slice pods) outer axis and/or a 'seq' (sequence-parallel)
    axis: the full shape is ('slice', 'data', 'seq', 'model'), axes of
    size 1 dropped (except 'data'/'model', always present).

    Axis order encodes the physical hierarchy: 'slice' is the
    OUTERMOST (slowest-varying) axis, so consecutive devices — which
    JAX enumerates ICI-contiguous within a slice — land in the same
    'slice' row and the cross-slice gradient reduction is the only
    traffic that rides DCN; 'seq' and 'model' are innermost so halo
    exchanges (parallel/sp_decoder.py) and TP collectives ride the
    tightest ICI loops. data=-1 means 'all remaining'.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (model * slices * seq) == 0, (n, model, slices, seq)
        data = n // (model * slices * seq)
    assert slices * data * seq * model == n, \
        (slices, data, seq, model, n)
    shape = {"slice": slices, "data": data, "seq": seq, "model": model}
    keep = {k: v for k, v in shape.items()
            if v > 1 or k in ("data", "model")}
    arr = np.asarray(devices).reshape(tuple(keep.values()))
    return Mesh(arr, axis_names=tuple(keep))


def _data_axes(mesh: Mesh):
    """Batch-sharding axes: ('slice','data') on a 3-axis mesh."""
    return ("slice", "data") if "slice" in mesh.axis_names else "data"


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axes (and 'slice'
    on a multi-slice mesh — per-slice gradient psums run over ICI,
    the cross-slice combine over DCN, both inserted by XLA)."""
    return NamedSharding(mesh, P(_data_axes(mesh)))


def _spec_for(path: str, x: Any, model_size: int) -> P:
    """Channel-sharding rule for one parameter leaf.

    Stacked WaveNet weights [L, ..., C_out] and dense/conv kernels
    [..., C_out] shard along the trailing (output-channel) axis when it
    divides the 'model' axis; biases and small leaves replicate. The VQ
    codebook [K, d] and the EMA ``VQState`` leaves (``sum`` [K,d],
    ``count`` [K]) all shard along K so the EMA update is layout-stable
    under TP (argmin is over gathered scores — fine at K<=512).
    """
    if model_size == 1 or not hasattr(x, "ndim") or x.ndim == 0:
        return P()
    leaf = path.rsplit("/", 1)[-1]
    if "codebook" in path or leaf in ("sum", "count"):
        return P("model") if x.shape[0] % model_size == 0 else P()
    if x.ndim >= 2 and x.shape[-1] % model_size == 0:
        return P(*([None] * (x.ndim - 1) + ["model"]))
    return P()


def _key_str(k) -> str:
    # DictKey has .key, SequenceKey .idx, GetAttrKey (NamedTuple) .name
    for attr in ("key", "idx", "name"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree mirroring ``params``."""
    model_size = mesh.shape["model"]

    def walk(path, x):
        keys = "/".join(_key_str(k) for k in path)
        return NamedSharding(mesh, _spec_for(keys, x, model_size))

    return jax.tree_util.tree_map_with_path(walk, params)
