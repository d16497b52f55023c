"""Real video pipeline tests: clip indexing, cv2 decode, resize-pad,
pts-aligned wav-sidecar audio, sharding, and the batch generator — against
synthetic mp4+wav fixtures written with the same libraries the loader uses."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mm_diffusion_tpu.data import media
from mm_diffusion_tpu.data.video import (
    MultimodalVideoDataset,
    build_clip_index,
    list_video_files,
    load_data,
    read_wav,
    resample_audio,
    resize_pad_video,
)


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    """Three tiny videos at 10 fps with tonal wav sidecars (distinct pitch
    per file so audio alignment is checkable)."""
    d = tmp_path_factory.mktemp("vids")
    fps, n_frames, size = 10, 24, 32
    for vi in range(3):
        path = str(d / f"clip{vi}.mp4")
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (size, size))
        assert writer.isOpened()
        for fr in range(n_frames):
            img = np.zeros((size, size, 3), np.uint8)
            img[:, :, vi % 3] = int(255 * fr / n_frames)  # ramp in one channel
            writer.write(img)
        writer.release()
        sr = 16000
        tt = np.arange(int(n_frames / fps * sr)) / sr
        tone = 0.5 * np.sin(2 * np.pi * (200 + 100 * vi) * tt).astype(np.float32)
        media.save_audio(tone, str(d / f"clip{vi}.wav"), audio_rate=sr)
    return str(d)


def test_list_and_index(video_dir):
    files = list_video_files(video_dir)
    assert len(files) == 3
    cache = os.path.join(video_dir, "idx.json")
    clips = build_clip_index(files, clip_frames=8, video_fps=10, cache_path=cache)
    # 24 frames @10fps native==target => 24 resampled; 24-8+1=17 starts/file
    assert len(clips) == 3 * 17
    assert os.path.exists(cache)
    # cache roundtrip gives identical clips
    clips2 = build_clip_index(files, clip_frames=8, video_fps=10, cache_path=cache)
    assert clips == clips2


def test_resize_pad_semantics():
    frames = np.random.randint(0, 255, (2, 20, 40, 3), np.uint8)
    out = resize_pad_video(frames, 32, 32)
    assert out.shape == (2, 32, 32, 3)
    # aspect preserved: 20x40 -> 16x32, padded 8 top+bottom
    assert np.all(out[:, :8] == 0) and np.all(out[:, 24:] == 0)


def test_wav_roundtrip_and_resample(tmp_path):
    sr = 16000
    tone = 0.3 * np.sin(np.linspace(0, 2 * np.pi * 440, sr)).astype(np.float32)
    media.save_audio(tone, str(tmp_path / "t.wav"), audio_rate=sr)
    a, sr_read = read_wav(str(tmp_path / "t.wav"))
    assert sr_read == sr and a.shape == (sr, 1)
    np.testing.assert_allclose(a[:, 0], tone, atol=2e-4)
    up = resample_audio(a, sr, 44100)
    assert abs(up.shape[0] - 44100) <= 2


def test_dataset_items_and_alignment(video_dir):
    ds = MultimodalVideoDataset(
        video_dir,
        video_size=(8, 3, 16, 16),
        audio_size=(1, 800),  # 0.8 s @ 1000 Hz? -> use audio_fps=1000
        video_fps=10,
        audio_fps=1000,
        random_flip=False,
    )
    assert len(ds) == 51
    item = ds.get_item(0)
    assert item["video"].shape == (8, 16, 16, 3)
    assert item["audio"].shape == (800, 1)
    assert item["video"].min() >= -1.0 and item["video"].max() <= 1.0
    # the ramp: later start index => brighter frames in the ramp channel
    early = ds.get_item(0)["video"]
    late = ds.get_item(12)["video"]
    assert late.mean() > early.mean()


def test_dataset_sharding(video_dir):
    ds0 = MultimodalVideoDataset(
        video_dir, (8, 3, 16, 16), (1, 800), shard=0, num_shards=2, audio_fps=1000
    )
    ds1 = MultimodalVideoDataset(
        video_dir, (8, 3, 16, 16), (1, 800), shard=1, num_shards=2, audio_fps=1000
    )
    assert set(ds0.indices).isdisjoint(ds1.indices)
    assert len(ds0.indices) + len(ds1.indices) == 51


def test_load_data_batches(video_dir):
    gen = load_data(
        data_dir=video_dir,
        batch_size=2,
        video_size=(8, 3, 16, 16),
        audio_size=(1, 800),
        video_fps=10,
        audio_fps=1000,
        num_workers=0,
        shard=0,
        num_shards=1,
    )
    batch = next(gen)
    assert batch["video"].shape == (2, 8, 16, 16, 3)
    assert batch["audio"].shape == (2, 800, 1)
    assert batch["video"].dtype == np.float32
    # audio actually carries the sidecar tone (not silence)
    assert float(np.abs(batch["audio"]).max()) > 0.05


def test_index_cache_corruption_tolerant(video_dir, tmp_path):
    """A half-written or garbage cache (another process died mid-write on a
    shared filesystem) must trigger a rebuild, never a crash."""
    files = list_video_files(video_dir)
    good = build_clip_index(files, clip_frames=8, video_fps=10, cache_path=None)
    for payload in ('{"files": [', "not json at all", '{"meta": 3}'):
        cache = str(tmp_path / "broken.json")
        with open(cache, "w") as f:
            f.write(payload)
        clips = build_clip_index(files, clip_frames=8, video_fps=10, cache_path=cache)
        assert clips == good
        with open(cache) as f:  # repaired: now valid and reusable
            assert json.load(f)["files"] == files


def test_index_cache_concurrent_build(video_dir, tmp_path):
    """N processes building the same cache concurrently (multi-host startup
    has no barrier) must all get identical indices and leave a valid cache —
    the tmp-file + os.replace write means no reader ever sees a torn file."""
    import multiprocessing as mp

    files = list_video_files(video_dir)
    cache = str(tmp_path / "shared.json")
    ctx = mp.get_context("spawn")  # fresh interpreters = real processes
    with ctx.Pool(4) as pool:
        results = pool.starmap(
            build_clip_index, [(files, 8, 10, cache)] * 4
        )
    assert all(r == results[0] for r in results)
    with open(cache) as f:
        cached = json.load(f)
    assert cached["files"] == files
    assert results[0] == build_clip_index(files, 8, 10, cache)


def test_shard_determinism_across_resume(video_dir):
    """A restarted process (resume) must reconstruct the SAME shard and the
    SAME iteration order: shards stay disjoint across the job after any
    subset of hosts restarts (parity contract: multimodal_datasets.py:147
    [shard::num_shards] slicing, which is construction-order deterministic)."""
    mk = lambda shard: MultimodalVideoDataset(
        video_dir, (8, 3, 16, 16), (1, 800), video_fps=10, audio_fps=1000,
        shard=shard, num_shards=2, random_flip=False, seed=7,
    )
    a1, a2, b1 = mk(0), mk(0), mk(1)
    assert a1.indices == a2.indices  # same shard after restart
    assert set(a1.indices).isdisjoint(b1.indices)  # still disjoint from peers
    it1 = a1.iter_indices(a1.indices, seed=123)
    it2 = a2.iter_indices(a2.indices, seed=123)
    for _ in range(2):  # same shuffle order and same decoded bytes
        x1, x2 = next(it1), next(it2)
        np.testing.assert_array_equal(x1["video"], x2["video"])
        np.testing.assert_array_equal(x1["audio"], x2["audio"])


def test_dead_worker_error_surfaces(tmp_path):
    """A worker that hits a hard error (no audio source anywhere) must kill
    the batch generator promptly even while OTHER workers keep producing —
    a dead worker silently dropping its shard is the failure mode the hard
    error exists to prevent."""
    d = tmp_path / "mixed"
    d.mkdir()
    fps, n_frames, size = 10, 24, 32
    for name, with_wav in (("good", True), ("noaudio", False)):
        path = str(d / f"{name}.mp4")
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (size, size)
        )
        assert writer.isOpened()
        for _ in range(n_frames):
            writer.write(np.zeros((size, size, 3), np.uint8))
        writer.release()
        if with_wav:
            sr = 1000
            tone = 0.5 * np.ones(int(n_frames / fps * sr), np.float32)
            media.save_audio(tone, str(d / f"{name}.wav"), audio_rate=sr)
    gen = load_data(
        data_dir=str(d), batch_size=2, video_size=(8, 3, 16, 16),
        audio_size=(1, 800), video_fps=10, audio_fps=1000,
        num_workers=2, shard=0, num_shards=1,
    )
    with pytest.raises(IOError, match="no audio source"):
        for _ in range(64):  # 2 files x 17 clips: poisoned item hits fast
            next(gen)


def test_audio_pitch_alignment(video_dir):
    """Each file has a distinct pitch; the loader must attach the right wav
    to the right video (pts-aligned window from the matching sidecar)."""
    ds = MultimodalVideoDataset(
        video_dir, (8, 3, 16, 16), (1, 12800), video_fps=10, audio_fps=16000,
        random_flip=False,
    )
    # clip indices are ordered by file; file i occupies [i*17, (i+1)*17)
    for vi in range(3):
        item = ds.get_item(vi * 17)
        a = item["audio"][:, 0]
        freqs = np.fft.rfftfreq(len(a), 1 / 16000)
        peak = freqs[np.abs(np.fft.rfft(a)).argmax()]
        assert abs(peak - (200 + 100 * vi)) < 20, (vi, peak)
