"""Data-pipeline audio contract + loader concurrency (r1 VERDICT items 6/7).

* missing audio source is a HARD error (r1 silently yielded zeros and trained
  a video-only model),
* pts alignment of the wav-sidecar window matches the reference's
  ``AudioFileClip(...).subclip(start_t, end_t)`` semantics,
* the ffmpeg-subprocess decoder branch works (exercised with a stub binary —
  the real binary is absent in this image),
* N loader workers actually decode in parallel (r1 serialized all decode
  under one lock).
"""

import os
import stat
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mm_diffusion_tpu.data import media  # noqa: E402
from mm_diffusion_tpu.data import video as video_data  # noqa: E402
from mm_diffusion_tpu.data.video import (  # noqa: E402
    MultimodalVideoDataset,
    load_data,
)

F, H, W = 4, 16, 16
AFPS = 16000


def _write_clip(base, seconds=1.0, fps=4.0, with_wav=True, audio=None):
    f = int(seconds * fps)
    vid = np.zeros((f, H, W, 3), np.float32)
    if audio is None:
        audio = np.linspace(-0.5, 0.5, int(seconds * AFPS), dtype=np.float32)[:, None]
    if with_wav:
        media.save_multimodal(vid, audio, base, fps=fps, audio_rate=AFPS)
    else:
        media.save_video(vid, base + ".mp4", fps=fps)


def test_missing_audio_is_hard_error(tmp_path):
    _write_clip(str(tmp_path / "clip"), with_wav=False)
    ds = MultimodalVideoDataset(
        str(tmp_path), (F, 3, H, W), (1, AFPS), video_fps=4.0, audio_fps=AFPS
    )
    with pytest.raises(IOError, match="no audio source"):
        ds.get_item(0)

    # and through the batched loader (worker errors propagate)
    it = load_data(
        data_dir=str(tmp_path), batch_size=2, video_size=(F, 3, H, W),
        audio_size=(1, AFPS), video_fps=4.0, audio_fps=AFPS, num_workers=2,
        shard=0, num_shards=1,
    )
    with pytest.raises(IOError, match="no audio source"):
        next(it)


def test_wav_sidecar_pts_alignment(tmp_path):
    # audio sample k has value k / AFPS (a ramp), so window start identifies
    # the pts offset exactly
    seconds = 2.0
    ramp = (np.arange(int(seconds * AFPS), dtype=np.float32) / AFPS / seconds - 0.5)[
        :, None
    ]
    _write_clip(str(tmp_path / "clip"), seconds=seconds, fps=4.0, audio=ramp)
    ds = MultimodalVideoDataset(
        str(tmp_path), (F, 3, H, W), (1, AFPS), video_fps=4.0, audio_fps=AFPS,
        random_flip=False,
    )
    # clip index 2 -> start frame 2 -> start_t = 0.5 s
    item = ds.get_item(2)
    start_t = 2 / 4.0
    expect0 = start_t / seconds - 0.5
    # int16 wav quantization: ~3e-5 tolerance
    assert abs(float(item["audio"][0, 0]) - expect0) < 1e-3
    # one second of 1s-long window: last sample ~ (start_t + 1.0)/seconds - 0.5
    expect_end = (start_t + 1.0) / seconds - 0.5
    assert abs(float(item["audio"][-1, 0]) - expect_end) < 1e-3


def test_ffmpeg_subprocess_branch(tmp_path, monkeypatch):
    """Stub ffmpeg binary: emits f32le samples whose value encodes -ss, so we
    prove the subprocess path parses the window and is preferred over (here
    absent) wav sidecars."""
    _write_clip(str(tmp_path / "clip"), seconds=2.0, with_wav=False)
    stub = tmp_path / "bin" / "ffmpeg"
    os.makedirs(stub.parent)
    stub.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, struct\n"
        "args = sys.argv\n"
        "ss = float(args[args.index('-ss') + 1])\n"
        "t = float(args[args.index('-t') + 1])\n"
        "ar = int(args[args.index('-ar') + 1])\n"
        "n = int(t * ar)\n"
        "sys.stdout.buffer.write(struct.pack(f'<{n}f', *([ss] * n)))\n"
    )
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setattr(video_data, "_FFMPEG", str(stub))

    ds = MultimodalVideoDataset(
        str(tmp_path), (F, 3, H, W), (1, AFPS), video_fps=4.0, audio_fps=AFPS
    )
    item = ds.get_item(1)  # start frame 1 -> start_t 0.25
    np.testing.assert_allclose(item["audio"][:100, 0], 0.25, atol=1e-6)


def test_worker_parallel_decode(tmp_path, monkeypatch):
    """4 workers must overlap item decode (~30 ms each, GIL released)."""
    for i in range(4):
        _write_clip(str(tmp_path / f"c{i}"), seconds=1.0)

    real_get = MultimodalVideoDataset.get_item

    def slow_get(self, idx, rng=None):
        time.sleep(0.03)
        return real_get(self, idx, rng)

    monkeypatch.setattr(MultimodalVideoDataset, "get_item", slow_get)

    def timed(num_workers):
        it = load_data(
            data_dir=str(tmp_path), batch_size=16, video_size=(F, 3, H, W),
            audio_size=(1, AFPS), video_fps=4.0, audio_fps=AFPS,
            num_workers=num_workers, shard=0, num_shards=1,
        )
        next(it)  # warm up threads/caches
        t0 = time.monotonic()
        for _ in range(3):
            next(it)
        return time.monotonic() - t0

    t1, t4 = timed(1), timed(4)
    assert t4 < t1 * 0.6, (t1, t4)
