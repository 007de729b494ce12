"""vlm-convert CLI round-trip: .pth -> Orbax -> .pth preserves weights
(BASELINE north-star interop tooling; both reference layouts accepted)."""

import numpy as np
import pytest
import jax

from vlm_bridge_tpu.configs import VLMConfig
from vlm_bridge_tpu.models import bridge as bridge_mod
from vlm_bridge_tpu.params.torch_bridge import (
    bridge_to_state_dict, load_pth, save_pth)
from vlm_bridge_tpu.tools.convert import main as convert_main

torch = pytest.importorskip("torch")


def test_pth_orbax_pth_roundtrip(tmp_path, capsys):
    cfg = VLMConfig.tiny_test().bridge
    params = bridge_mod.init(jax.random.key(7), cfg)

    # write a reference-format .pth, import it, re-export it
    src = tmp_path / "src.pth"
    save_pth(params, cfg, src)
    rc = convert_main(["pth-to-orbax", str(src), str(tmp_path / "store"),
                       "--slot", "imported", "--preset", "tiny"])
    assert rc == 0
    rc = convert_main(["orbax-to-pth", str(tmp_path / "store"),
                       str(tmp_path / "back.pth"), "--slot", "imported",
                       "--preset", "tiny"])
    assert rc == 0

    a = load_pth(src, cfg)
    b = load_pth(tmp_path / "back.pth", cfg)
    for ka, kb in zip(sorted(bridge_to_state_dict(a, cfg)),
                      sorted(bridge_to_state_dict(b, cfg))):
        assert ka == kb
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_show_trainer_layout(tmp_path, capsys):
    """`show` must recognize the trainer layout too (model_state_dict with
    bridge_module.-prefixed keys, reference training_orchestrator.py:114-125)."""
    cfg = VLMConfig.tiny_test().bridge
    params = bridge_mod.init(jax.random.key(8), cfg)
    sd = {("bridge_module." + k): torch.from_numpy(np.ascontiguousarray(v))
          for k, v in bridge_to_state_dict(params, cfg).items()}
    path = tmp_path / "trainer.pth"
    torch.save({"model_state_dict": sd, "epoch": 3,
                "optimizer_state_dict": {}}, str(path))
    assert convert_main(["show", str(path)]) == 0
    out = capsys.readouterr().out
    assert "trainer checkpoint" in out

    # and the importer loads it
    imported = load_pth(path, cfg)
    for x, y in zip(jax.tree.leaves(imported), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_load_from_args_roundtrip(tmp_path):
    """tools/loading.load_from_args restores a saved bridge checkpoint."""
    import argparse
    import jax

    from vlm_bridge_tpu.runtime.checkpoint import CheckpointStore
    from vlm_bridge_tpu.tools.loading import add_model_args, load_from_args

    cfg = VLMConfig.tiny_test().bridge
    params = bridge_mod.init(jax.random.key(11), cfg)
    store = CheckpointStore(tmp_path / "ckpt")
    store.save("best", bridge_params=params)

    ap = argparse.ArgumentParser()
    add_model_args(ap)
    args = ap.parse_args(["--preset", "tiny",
                          "--checkpoint", str(tmp_path / "ckpt" / "best")])
    _, loaded, tok = load_from_args(args)
    for x, y in zip(jax.tree.leaves(loaded["bridge"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert tok.encode("hi")[0] == tok.bos_token_id


def test_load_from_args_quantize_validation():
    import argparse

    import pytest as _pytest

    from vlm_bridge_tpu.tools.loading import add_model_args, load_from_args

    ap = argparse.ArgumentParser()
    add_model_args(ap)
    args = ap.parse_args(["--preset", "tiny", "--quantize", "mpl"])
    with _pytest.raises(ValueError, match="unknown quantize parts"):
        load_from_args(args)


def test_partial_restore_from_full_slot(tmp_path):
    """Weights-only template restores from a full training slot (the
    vlm-eval --checkpoint ckpt/latest path the smoke script exercises)."""
    import jax
    import optax

    from vlm_bridge_tpu.runtime.checkpoint import CheckpointStore

    cfg = VLMConfig.tiny_test().bridge
    params = bridge_mod.init(jax.random.key(3), cfg)
    opt = optax.adamw(1e-3)
    store = CheckpointStore(tmp_path)
    store.save("latest", bridge_params=params, opt_state=opt.init(params),
               meta={"epoch": 2})

    restored, meta = store.load(
        "latest", template={"bridge_params": params})
    assert meta["epoch"] == 2
    for x, y in zip(jax.tree.leaves(restored["bridge_params"]),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
