"""SummaryWriter fidelity: files must parse with TensorBoard's OWN reader
(the dependency-free writer hand-encodes TFRecord + protobuf — any framing
or wire-format bug shows up here, not in production dashboards)."""

import numpy as np
import pytest

from vlm_bridge_tpu.runtime.tb_writer import SummaryWriter

tb = pytest.importorskip("tensorboard")


def _load_events(log_dir):
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader)

    events = []
    for f in sorted(log_dir.glob("events.out.tfevents.*")):
        events.extend(EventFileLoader(str(f)).Load())
    return events


def test_scalars_roundtrip_through_tensorboard(tmp_path):
    w = SummaryWriter(tmp_path)
    w.add_scalar("train/loss", 3.25, 7)
    w.add_scalar("val/perplexity", 123.5, 8)
    w.close()

    events = _load_events(tmp_path)
    assert events[0].file_version == "brain.Event:2"
    scalars = {}
    for e in events:
        for v in getattr(e.summary, "value", []):
            # TB's compat layer migrates simple_value -> DT_FLOAT tensor
            if v.WhichOneof("value") == "tensor":
                scalars[(v.tag, e.step)] = v.tensor.float_val[0]
            else:
                scalars[(v.tag, e.step)] = v.simple_value
    assert scalars[("train/loss", 7)] == pytest.approx(3.25)
    assert scalars[("val/perplexity", 8)] == pytest.approx(123.5)


def test_text_roundtrip_through_tensorboard(tmp_path):
    w = SummaryWriter(tmp_path)
    w.add_text("val/sample_0", "a dog **runs**", 3)
    w.close()

    events = _load_events(tmp_path)
    found = []
    for e in events:
        for v in getattr(e.summary, "value", []):
            if v.tag.startswith("val/sample_0"):
                assert v.metadata.plugin_data.plugin_name == "text"
                found.extend(v.tensor.string_val)
    assert found == [b"a dog **runs**"]
