"""Checkpoint store: Orbax pytree checkpoints in the reference's 3-slot scheme.

Slots (reference save_checkpoint, training_orchestrator.py:104-156):
  latest/            — full train state, written every save
  best/              — full train state at the best val loss
  best_weights_only/ — bridge params only (deploy artifact)

"Full train state" = bridge params + AdamW state + step + epoch counters +
early-stop state. Counters travel in a JSON sidecar (human-readable, robust
across optax version changes). Frozen encoder weights are NOT checkpointed —
they are reproducible from the HF snapshots (the reference does the same,
filtering state_dict keys on "bridge_module").

`.pth` interop lives in params/torch_bridge.py; `export_pth` here writes a
reference-loadable weights file from any slot.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


class CheckpointStore:
    def __init__(self, directory: str | Path):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _slot(self, name: str) -> Path:
        return self.dir / name

    def save(
        self,
        slot: str,
        *,
        bridge_params,
        opt_state=None,
        meta: Optional[Dict[str, Any]] = None,
    ) -> None:
        """Write a slot atomically (orbax requires a fresh dir; we write to
        tmp then swap).

        Multi-host: EVERY process must call this (orbax's Checkpointer.save
        barriers internally and writes from the primary host only — a
        rank-0-only call deadlocks on its 'Checkpointer:save_start'
        barrier, observed in tests/test_multihost.py). The tmp-swap
        filesystem mutations here run on process 0 only, fenced so readers
        on any rank only ever see fully-swapped slots."""
        import shutil

        multi = jax.process_count() > 1
        primary = jax.process_index() == 0
        tree = {"bridge_params": bridge_params}
        if opt_state is not None:
            tree["opt_state"] = opt_state
        path = self._slot(slot)
        tmp = self.dir / (slot + ".tmp")
        if primary and tmp.exists():
            shutil.rmtree(tmp)
        if multi:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_pre_{slot}")
        _checkpointer().save(tmp.absolute(), jax.device_get(tree))
        if primary:
            (tmp / "meta.json").write_text(json.dumps(meta or {}, indent=2))
            if path.exists():
                shutil.rmtree(path)
            tmp.rename(path)
        if multi:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_post_{slot}")

    def exists(self, slot: str) -> bool:
        return self._slot(slot).exists()

    def load(
        self, slot: str, *, template
    ) -> Tuple[Any, Dict[str, Any]]:
        """Restore a slot. `template` is a pytree with the target structure
        (e.g. {"bridge_params": ..., "opt_state": ...} from a fresh init) so
        optax NamedTuple types are reconstructed exactly.

        A template covering only a SUBSET of the slot's top-level keys works
        too (e.g. weights-only {"bridge_params": ...} from a full training
        slot): the extra on-disk subtrees are ignored."""
        path = self._slot(slot)
        if not path.exists():
            raise FileNotFoundError(f"no checkpoint slot: {path}")
        try:
            restored = _checkpointer().restore(
                path.absolute(), item=jax.device_get(template))
        except ValueError:
            # partial restore: raw-load, then reshape the requested subtrees
            # onto the template (restores leaf order + NamedTuple types)
            raw = _checkpointer().restore(path.absolute())
            if not (isinstance(template, dict) and isinstance(raw, dict)
                    and set(template) <= set(raw)):
                raise
            restored = {}
            for key, sub_t in template.items():
                leaves = jax.tree.leaves(raw[key])
                treedef = jax.tree.structure(jax.device_get(sub_t))
                restored[key] = jax.tree.unflatten(treedef, leaves)
                # unflatten is positional and silently misassigns leaves if
                # the on-disk order (sorted dict keys) differs from the
                # template treedef's (e.g. a NamedTuple whose field order is
                # not alphabetical) — verify every leaf landed on a slot of
                # matching shape+dtype and refuse otherwise
                for t_leaf, r_leaf in zip(jax.tree.leaves(sub_t), leaves):
                    t_shape = getattr(t_leaf, "shape", np.shape(t_leaf))
                    r_shape = getattr(r_leaf, "shape", np.shape(r_leaf))
                    t_dtype = np.asarray(t_leaf).dtype
                    r_dtype = np.asarray(r_leaf).dtype
                    if tuple(t_shape) != tuple(r_shape) or t_dtype != r_dtype:
                        raise ValueError(
                            f"partial restore of {key!r}: leaf mismatch "
                            f"(template {t_shape}/{t_dtype} vs restored "
                            f"{r_shape}/{r_dtype}) — on-disk leaf order does "
                            f"not match the template structure; restore with "
                            f"a full template instead")
        meta_file = path / "meta.json"
        meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
        return restored, meta

    def export_pth(self, slot: str, bridge_cfg, out_path: str | Path,
                   *, template) -> None:
        """Slot -> reference-format .pth (weights only)."""
        from vlm_bridge_tpu.params import torch_bridge

        restored, _ = self.load(slot, template=template)
        torch_bridge.save_pth(restored["bridge_params"], bridge_cfg, out_path)
