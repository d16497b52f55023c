"""Host-side paired audio-video dataset pipeline.

Re-design of `mm_diffusion/multimodal_datasets.py` for a TPU host: the
reference builds a torchvision ``VideoClips`` index (pickle-cached) and
re-decodes audio per item with moviepy (multimodal_datasets.py:53-79,193-205).
Here:

* **clip index**: one JSON cache per (frames, gap, fps) config holding per-file
  frame counts / native fps; clips are dense windows over fps-resampled frame
  indices — the same clip enumeration contract as VideoClips with
  ``frames_between_clips=1``.
* **video decode**: OpenCV (no torchvision in this image); frames are mapped
  from target-fps indices back to native frame indices.
* **audio**: this image has no compressed-audio decoder (no ffmpeg/moviepy),
  so audio comes from a ``.wav`` sidecar with the same basename (or embedded
  WAV files), resampled with polyphase filtering and pts-aligned to the clip
  window exactly like the reference's ``subclip(start_t, end_t)``.
* **sharding**: ``[shard::num_shards]`` slicing per host process
  (parity: multimodal_datasets.py:147) keyed by ``jax.process_index()``.
* **prefetch**: a background thread pool decodes ahead so the accelerator
  never waits on host IO (replaces torch DataLoader workers).

Tensor contract (channels-last): video ``[F,H,W,C]`` float32 in [-1,1],
audio ``[L,C]`` float32 in [-1,1].
"""

from __future__ import annotations

import json
import os
import queue
import random
import threading
import wave
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

try:
    import cv2  # type: ignore

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

VIDEO_EXTS = (".avi", ".gif", ".mp4")


def list_video_files(data_dir: str) -> List[str]:
    """Recursive scan (parity: _list_video_files_recursively,
    multimodal_datasets.py:105-117)."""
    out = []
    for root, _dirs, files in os.walk(data_dir):
        for f in sorted(files):
            if f.lower().endswith(VIDEO_EXTS):
                out.append(os.path.join(root, f))
    return sorted(out)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """stdlib WAV reader -> float32 [L, C] in [-1,1] + sample rate."""
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        sw = f.getsampwidth()
        raw = f.readframes(n)
    if sw == 2:
        a = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif sw == 1:
        a = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        a = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return a.reshape(-1, ch), sr


def resample_audio(a: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resample [L,C] (the reference delegates to moviepy/ffmpeg)."""
    if sr_in == sr_out:
        return a
    try:
        from scipy.signal import resample_poly
        from math import gcd

        g = gcd(sr_in, sr_out)
        return resample_poly(a, sr_out // g, sr_in // g, axis=0).astype(np.float32)
    except Exception:
        # linear fallback
        n_out = int(round(a.shape[0] * sr_out / sr_in))
        xs = np.linspace(0, a.shape[0] - 1, n_out)
        idx = xs.astype(np.int64)
        frac = (xs - idx)[:, None]
        idx2 = np.minimum(idx + 1, a.shape[0] - 1)
        return ((1 - frac) * a[idx] + frac * a[idx2]).astype(np.float32)


def probe_video(path: str) -> Dict:
    cap = cv2.VideoCapture(path)
    try:
        fps = cap.get(cv2.CAP_PROP_FPS) or 0.0
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
        return {"fps": float(fps if fps > 0 else 30.0), "frames": n}
    finally:
        cap.release()


def build_clip_index(
    files: List[str], clip_frames: int, video_fps: float, cache_path: Optional[str]
) -> List[Tuple[int, int]]:
    """Enumerate (file_idx, start_resampled_frame) dense clips; JSON-cached
    (parity with the VideoClips pickle cache, multimodal_datasets.py:53-79)."""
    meta = None
    if cache_path and os.path.exists(cache_path):
        with open(cache_path) as f:
            cached = json.load(f)
        if cached.get("files") == files:
            meta = cached["meta"]
    if meta is None:
        meta = [probe_video(p) for p in files]
        if cache_path:
            with open(cache_path, "w") as f:
                json.dump({"files": files, "meta": meta}, f)
    clips = []
    for i, m in enumerate(meta):
        total_resampled = int(m["frames"] * video_fps / m["fps"])
        for start in range(max(0, total_resampled - clip_frames + 1)):
            clips.append((i, start))
        if 0 < total_resampled < clip_frames:
            clips.append((i, 0))  # short video: pad-at-decode (ref :184-188)
    return clips


def resize_pad_video(frames: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Aspect-preserving bicubic resize + center pad
    (parity: process_video, multimodal_datasets.py:153-170)."""
    f, h, w, c = frames.shape
    ratio = min(out_h / h, out_w / w)
    nh, nw = int(h * ratio), int(w * ratio)
    resized = np.stack(
        [cv2.resize(fr, (nw, nh), interpolation=cv2.INTER_CUBIC) for fr in frames]
    )
    if resized.ndim == 3:
        resized = resized[..., None]
    pad_h, pad_w = out_h - nh, out_w - nw
    top, left = pad_h // 2, pad_w // 2
    out = np.zeros((f, out_h, out_w, c), resized.dtype)
    out[:, top : top + nh, left : left + nw] = resized
    return out


class MultimodalVideoDataset:
    """Paired AV clips (parity surface: MultimodalDataset,
    multimodal_datasets.py:118-225)."""

    def __init__(
        self,
        data_dir: str,
        video_size: Tuple[int, int, int, int],  # (F, C, H, W) reference order
        audio_size: Tuple[int, int],  # (C, L)
        video_fps: float = 10.0,
        audio_fps: int = 16000,
        shard: int = 0,
        num_shards: int = 1,
        random_flip: bool = True,
        seed: int = 0,
    ):
        assert _HAS_CV2, "OpenCV is required for video decoding"
        self.f, self.c, self.h, self.w = video_size
        self.ca, self.l = audio_size
        self.video_fps = video_fps
        self.audio_fps = audio_fps
        self.random_flip = random_flip
        self.files = list_video_files(data_dir)
        assert self.files, f"no video files under {data_dir}"
        cache = os.path.join(
            data_dir, f"clip_index_f{self.f}_g1_r{int(video_fps)}.json"
        )
        self.clips = build_clip_index(self.files, self.f, video_fps, cache)
        self.indices = list(range(len(self.clips)))[shard::num_shards]
        self._rng = random.Random(seed + shard)
        self._audio_cache: Dict[str, Tuple[np.ndarray, int]] = {}

    def __len__(self):
        return len(self.indices)

    def _decode_video(self, path: str, start: int) -> np.ndarray:
        cap = cv2.VideoCapture(path)
        try:
            native_fps = cap.get(cv2.CAP_PROP_FPS) or self.video_fps
            frames = []
            for j in range(self.f):
                native_idx = int(round((start + j) * native_fps / self.video_fps))
                cap.set(cv2.CAP_PROP_POS_FRAMES, native_idx)
                ok, fr = cap.read()
                if not ok:
                    break
                frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
        finally:
            cap.release()
        if not frames:
            raise IOError(f"decode failed: {path}@{start}")
        frames = np.stack(frames)
        if frames.shape[0] < self.f:  # pad by repeating last (ref :184-188)
            pad = np.repeat(frames[-1:], self.f - frames.shape[0], axis=0)
            frames = np.concatenate([frames, pad], axis=0)
        return frames

    def _load_audio_window(self, path: str, start_t: float, end_t: float) -> np.ndarray:
        """pts-aligned audio window from the .wav sidecar
        (parity: multimodal_datasets.py:193-215)."""
        wav_path = os.path.splitext(path)[0] + ".wav"
        if not os.path.exists(wav_path):
            return np.zeros((self.l, self.ca), np.float32)
        if wav_path not in self._audio_cache:
            self._audio_cache[wav_path] = read_wav(wav_path)
        raw, sr = self._audio_cache[wav_path]
        seg = raw[int(start_t * sr) : int(end_t * sr)]
        seg = resample_audio(seg, sr, self.audio_fps)
        if seg.shape[1] > self.ca:  # mono downmix: first channel (ref :209-210)
            seg = seg[:, : self.ca]
        audio = np.zeros((self.l, self.ca), np.float32)
        n = min(self.l, seg.shape[0])
        audio[:n] = seg[:n]
        return audio

    def get_item(self, idx: int) -> Dict[str, np.ndarray]:
        """Corrupt clips are skipped by advancing the index — the reference's
        failure-tolerance loop (multimodal_datasets.py:175-181)."""
        for _ in range(len(self.clips)):
            file_idx, start = self.clips[idx]
            path = self.files[file_idx]
            try:
                frames = self._decode_video(path, start)
                break
            except Exception:
                idx = (idx + 1) % len(self.clips)
        else:
            raise IOError("all clips failed to decode")

        video = resize_pad_video(frames, self.h, self.w).astype(np.float32)
        video = video / 127.5 - 1.0
        if self.random_flip and self._rng.random() < 0.5:
            video = video[:, :, ::-1].copy()

        start_t = start / self.video_fps
        end_t = (start + self.f) / self.video_fps
        audio = self._load_audio_window(path, start_t, end_t)
        return {"video": video, "audio": audio}

    def __iter__(self):
        order = list(self.indices)
        while True:
            self._rng.shuffle(order)
            for i in order:
                yield self.get_item(i)


def load_data(
    *,
    data_dir: str,
    batch_size: int,
    video_size: Tuple[int, int, int, int],
    audio_size: Tuple[int, int],
    video_fps: float = 10.0,
    audio_fps: int = 16000,
    random_flip: bool = True,
    num_workers: int = 4,
    shard: Optional[int] = None,
    num_shards: Optional[int] = None,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite batch generator (parity surface: load_data,
    multimodal_datasets.py:16-103).  ``data_dir="synthetic"`` falls back to
    the procedural dataset (no media decode needed)."""
    if data_dir == "synthetic":
        from .synthetic import load_synthetic_data

        yield from load_synthetic_data(
            batch_size, video_size, audio_size, seed=seed,
            shard=shard or 0, num_shards=num_shards or 1,
        )
        return

    if shard is None or num_shards is None:
        import jax

        shard = jax.process_index()
        num_shards = jax.process_count()

    ds = MultimodalVideoDataset(
        data_dir, video_size, audio_size, video_fps, audio_fps,
        shard=shard, num_shards=num_shards, random_flip=random_flip, seed=seed,
    )
    it = iter(ds)

    if num_workers <= 0:
        while True:
            items = [next(it) for _ in range(batch_size)]
            yield {
                k: np.stack([x[k] for x in items]).astype(np.float32)
                for k in ("video", "audio")
            }

    # thread-pool prefetch (host decode overlaps device compute)
    q: "queue.Queue" = queue.Queue(maxsize=4)
    lock = threading.Lock()

    def worker():
        while True:
            items = []
            with lock:
                for _ in range(batch_size):
                    items.append(next(it))
            q.put(
                {
                    k: np.stack([x[k] for x in items]).astype(np.float32)
                    for k in ("video", "audio")
                }
            )

    for _ in range(num_workers):
        threading.Thread(target=worker, daemon=True).start()
    while True:
        yield q.get()
