"""Mesh/sharding-rule unit tests (parallel/sharding.py): TP regex rules,
replication defaults, batch sharding placement."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vlm_bridge_tpu.configs import VLMConfig
from vlm_bridge_tpu.models import full_model
from vlm_bridge_tpu.parallel import (
    auto_mesh, batch_sharding, param_shardings, shard_batch)


@pytest.fixture(scope="module")
def mesh():
    return auto_mesh(data=4, model=2, devices=jax.devices()[:8])


@pytest.fixture(scope="module")
def params():
    return full_model.init(jax.random.key(0), VLMConfig.tiny_test(),
                           frozen_dtype=jnp.float32)


def test_tp_rules_shard_lm_weights(mesh, params):
    shardings = param_shardings(mesh, params)
    lp = shardings["lm"]["layers"]["0"]
    assert lp["attn"]["q"].spec == P(None, "model")      # head-sharded
    assert lp["attn"]["o"].spec == P("model", None)      # contraction-sharded
    assert lp["mlp"]["gate"].spec == P(None, "model")
    assert lp["mlp"]["down"].spec == P("model", None)
    # norms + embedding replicated
    assert lp["input_norm"].spec == P()
    assert shardings["lm"]["embedding"].spec == P(None, None)


def test_bridge_and_vision_replicated(mesh, params):
    shardings = param_shardings(mesh, params)
    for leaf in jax.tree.leaves(
            jax.tree.map(lambda s: s.spec, shardings["bridge"])):
        assert leaf == P()
    for leaf in jax.tree.leaves(
            jax.tree.map(lambda s: s.spec, shardings["vision"])):
        assert leaf == P()


def test_model_axis_1_collapses_to_replication(params):
    mesh1 = auto_mesh(data=8, model=1, devices=jax.devices()[:8])
    shardings = param_shardings(mesh1, params)
    for leaf in jax.tree.leaves(jax.tree.map(lambda s: s.spec, shardings)):
        assert leaf == P()


def test_shard_batch_places_batch_dim(mesh):
    batch = {
        "input_ids": np.ones((8, 4), np.int32),
        "captions": ["x"] * 8,  # non-array entries dropped
    }
    dev = shard_batch(mesh, batch)
    assert "captions" not in dev
    assert dev["input_ids"].sharding.spec == P("data", None)
    # each data-row group lands on one mesh row
    assert len(dev["input_ids"].sharding.device_set) == 8


def test_auto_mesh_validates_size():
    with pytest.raises(ValueError, match="mesh"):
        auto_mesh(data=3, model=3, devices=jax.devices()[:8])


@pytest.mark.slow
def test_gemma2_27b_tp_lowering():
    """27B never fits one chip — prove the TP story at its REAL dims by
    AOT-compiling the train step on a (2 data x 4 model) virtual mesh
    (GSPMD partitioning failures are shape-dependent, so tiny stand-ins
    prove nothing; same method as __graft_entry__'s flagship phase).
    Nothing is materialized: 27B params stay ShapeDtypeStructs."""
    from vlm_bridge_tpu.configs import TrainingConfig
    from vlm_bridge_tpu.training.train_step import (
        make_optimizer, make_schedule, make_train_step)
    import __graft_entry__ as ge

    cfg = VLMConfig.gemma2_27b()
    assert cfg.lm.hidden_size == 4608 and cfg.lm.num_layers == 46
    tc = TrainingConfig(batch_size=8, loss_chunk_size=128)
    mesh = auto_mesh(data=2, model=4, devices=jax.devices()[:8])
    opt = make_optimizer(tc, 100)
    step_fn = make_train_step(cfg, tc, opt, make_schedule(tc, 100),
                              activation_dtype=jnp.bfloat16)
    state_av, frozen_av, batch_av, rng_av, params_sh, p_shardings = (
        ge._flagship_avals(cfg, tc, mesh))
    # the TP rules must actually split the 27B attention/MLP weights
    qspec = p_shardings["lm"]["layers"]["0"]["attn"]["q"].spec \
        if isinstance(params_sh["lm"]["layers"], dict) \
        else p_shardings["lm"]["layers"][0]["attn"]["q"].spec
    assert "model" in str(qspec)
    with mesh:
        compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(
            state_av, frozen_av, batch_av, rng_av).compile()
    assert jax.tree.leaves(compiled.output_shardings)
