"""Optional wandb dashboard streaming (reference: use_db flag,
multimodal_train_util.py:85-94,234-261).

wandb is not installed in this environment, so the tests pin BOTH sides of
the gate: a stub module injected into sys.modules captures the exact calls
(init config, scalar KVs with step, media dispatch by extension), and the
no-stub path proves enable_wandb degrades to the on-disk sinks instead of
raising.
"""

import sys
import types

import pytest

from mm_diffusion_tpu.utils.logger import KVLogger


class _StubWandb(types.ModuleType):
    def __init__(self):
        super().__init__("wandb")
        self.init_calls = []
        self.log_calls = []

    def init(self, **kw):
        self.init_calls.append(kw)
        return types.SimpleNamespace(**kw)

    def log(self, payload, step=None):
        self.log_calls.append((payload, step))

    def Video(self, path):
        return ("video", path)

    def Image(self, path):
        return ("image", path)

    def Audio(self, path):
        return ("audio", path)


@pytest.fixture
def stub(monkeypatch):
    mod = _StubWandb()
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_enable_without_wandb_degrades(monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    lg = KVLogger(stdout=False)
    assert lg.enable_wandb("proj") is False
    lg.logkv("loss", 1.0)
    assert lg.dumpkvs() == {"loss": 1.0}  # on-disk/stdout sinks unaffected
    assert lg.log_media("/nonexistent.mp4") is False


def test_scalars_stream_with_step(stub):
    lg = KVLogger(stdout=False)
    assert lg.enable_wandb("landscape_runs", name="run_a") is True
    assert stub.init_calls[0]["project"] == "landscape_runs"
    assert stub.init_calls[0]["name"] == "run_a"

    lg.logkv("step", 42)
    lg.logkv_mean("loss", 0.5)
    lg.logkv_mean("loss", 1.5)
    lg.dumpkvs()
    payload, step = stub.log_calls[0]
    assert step == 42
    assert payload["loss"] == 1.0

    lg.logkv("grad_norm", 2.0)  # no step key -> step=None
    lg.dumpkvs()
    assert stub.log_calls[1] == ({"grad_norm": 2.0}, None)


def test_media_dispatch_by_extension(stub, tmp_path):
    lg = KVLogger(stdout=False)
    lg.enable_wandb("p")
    files = {}
    for ext in ("mp4", "gif", "png", "jpg", "wav", "txt"):
        p = tmp_path / f"preview.{ext}"
        p.write_bytes(b"x")
        files[ext] = str(p)

    assert lg.log_media(files["mp4"], step=7) is True
    assert lg.log_media(files["gif"]) is True
    assert lg.log_media(files["png"]) is True
    assert lg.log_media(files["jpg"]) is True
    assert lg.log_media(files["wav"], key="audio_sample") is True
    assert lg.log_media(files["txt"]) is False  # unknown type
    assert lg.log_media(str(tmp_path / "missing.mp4")) is False

    kinds = [next(iter(p.values()))[0] for p, _ in stub.log_calls]
    assert kinds == ["video", "video", "image", "image", "audio"]
    assert stub.log_calls[0][1] == 7
    assert "audio_sample" in stub.log_calls[4][0]


def test_train_loop_preview_hook_streams_media(stub, tmp_path, monkeypatch):
    """TrainLoop.sample_preview forwards the task's primary media path to
    the active logger (loop.py hook) — exercised without compiling a model
    by calling the unbound method on a minimal stand-in."""
    from mm_diffusion_tpu.train.loop import TrainLoop
    from mm_diffusion_tpu.utils import logger as kvlogger

    lg = kvlogger.configure(str(tmp_path), stdout=False)
    lg.enable_wandb("p")
    preview = tmp_path / "previews" / "step_000005_grid.mp4"
    preview.parent.mkdir()
    preview.write_bytes(b"x")

    calls = []

    class _Task:
        def preview(self, loop, step):
            calls.append(step)
            return str(preview)

    fake_loop = types.SimpleNamespace(task=_Task())
    TrainLoop.sample_preview(fake_loop, 5)
    assert calls == [5]
    assert stub.log_calls[-1][0]["sample"] == ("video", str(preview))
    assert stub.log_calls[-1][1] == 5
    kvlogger.configure(None, stdout=False)  # reset module default
