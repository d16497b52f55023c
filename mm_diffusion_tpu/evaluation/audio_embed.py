"""Audio embedding networks for FAD.

The reference computes FAD on frozen AudioCLIP audio-tower embeddings
(`mm_diffusion/evaluator.py:65,162,170`; vendored model under
`evaluations/AudioCLIP/`).  The published AudioCLIP weights cannot be fetched
in this environment (no egress), so this module provides:

* :class:`LogMelEmbedder` — a deterministic log-mel statistics embedding
  (offline fallback; self-consistent FAD numbers, NOT comparable to the
  paper's AudioCLIP-based FAD), and
* :func:`load_audioclip` — a gated loader that converts the AudioCLIP torch
  checkpoint when it exists on disk (full tower port planned; raises a clear
  error otherwise).
"""

from __future__ import annotations

import numpy as np


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(n_mels: int, n_fft: int, sr: int, fmin=0.0, fmax=None) -> np.ndarray:
    fmax = fmax or sr / 2
    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        l, c, r = bins[i], bins[i + 1], bins[i + 2]
        if c > l:
            fb[i, l:c] = (np.arange(l, c) - l) / (c - l)
        if r > c:
            fb[i, c:r] = (r - np.arange(c, r)) / (r - c)
    return fb


class LogMelEmbedder:
    """Log-mel spectrogram statistics embedding for audio sets.

    Embedding = per-mel-band [mean, std, max] of the log-mel spectrogram plus
    band-to-band correlation summary — a 4*n_mels vector.  Deterministic,
    dependency-free, usable for relative FAD comparisons between runs.
    """

    def __init__(self, sample_rate: int = 16000, n_fft: int = 1024,
                 hop: int = 256, n_mels: int = 64):
        self.sr = sample_rate
        self.n_fft = n_fft
        self.hop = hop
        self.fb = mel_filterbank(n_mels, n_fft, sample_rate)
        self.window = np.hanning(n_fft)

    def log_mel(self, audio: np.ndarray) -> np.ndarray:
        """[L] mono -> [frames, n_mels]"""
        a = np.asarray(audio, np.float32).reshape(-1)
        n_frames = max(1, 1 + (len(a) - self.n_fft) // self.hop)
        frames = np.stack(
            [a[i * self.hop : i * self.hop + self.n_fft] for i in range(n_frames)]
        )
        spec = np.abs(np.fft.rfft(frames * self.window, axis=-1)) ** 2
        mel = spec @ self.fb.T
        return np.log(mel + 1e-8)

    def __call__(self, audio_batch: np.ndarray) -> np.ndarray:
        """[B, L] or [B, L, C] -> [B, D] embeddings."""
        a = np.asarray(audio_batch)
        if a.ndim == 3:
            a = a[..., 0]
        out = []
        for x in a:
            lm = self.log_mel(x)
            d = np.concatenate(
                [lm.mean(0), lm.std(0), lm.max(0), np.diff(lm, axis=0).std(0)]
            )
            out.append(d)
        return np.stack(out).astype(np.float32)


def load_audioclip(checkpoint_path: str):
    """Load the flax ESResNeXt-FBSP audio tower from the published AudioCLIP
    checkpoint (see :mod:`mm_diffusion_tpu.evaluation.audioclip`) and return a
    batched embedding callable matching :class:`LogMelEmbedder`'s interface."""
    import jax
    import jax.numpy as jnp

    from .audioclip import load_audioclip_audio_tower

    model, variables = load_audioclip_audio_tower(checkpoint_path)
    apply = jax.jit(lambda a: model.apply(variables, a))

    def embed(audio_batch: np.ndarray) -> np.ndarray:
        a = np.asarray(audio_batch, np.float32)
        if a.ndim == 3 and a.shape[-1] <= 4:  # [B, L, C] channels-last -> [B, C, L]
            a = np.transpose(a, (0, 2, 1))
        elif a.ndim == 2:
            a = a[:, None, :]
        return np.asarray(jax.device_get(apply(jnp.asarray(a))))

    return embed
