"""Mesh/sharding: TP param placement + dp x tp train step on virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from dist_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, _tp_spec_for, shard_params)


def test_tp_specs():
    from jax.sharding import PartitionSpec as P
    assert _tp_spec_for("visual/resblocks/block/attn/in_proj_weight", 3) == \
        P(None, None, MODEL_AXIS)
    assert _tp_spec_for("visual/resblocks/block/mlp/c_proj/kernel", 3) == \
        P(None, MODEL_AXIS, None)
    assert _tp_spec_for("visual/class_embedding", 1) == P()


def test_shard_params_places_tp():
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, (DATA_AXIS, MODEL_AXIS))
    tree = {
        "visual": {"resblocks": {"block": {"mlp": {"c_fc": {
            "kernel": jnp.zeros((2, 64, 256))}}}}},
        "scalar": jnp.zeros(()),
    }
    placed = shard_params(mesh, tree)
    k = placed["visual"]["resblocks"]["block"]["mlp"]["c_fc"]["kernel"]
    # sharded over the model axis on the last dim: each shard holds 128 cols
    assert k.sharding.shard_shape(k.shape)[-1] == 128


def test_dryrun_multichip_dp_tp():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
