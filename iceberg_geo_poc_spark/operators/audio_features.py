"""Audio feature extraction — framing, STFT, log-mel filterbank.

The standard front-end of every speech/audio model (wav2vec-style
pretraining consumes raw frames; Whisper-style consumes log-mels).
Pure numpy (rfft), run per-file inside mapInPandas batches like every
media operator — embarrassingly parallel, no shuffle, no Python UDF in
any per-ROW hot path (each row is a whole clip).

Correctness strategy: the DSP core is property-tested directly
(Parseval energy conservation, pure-tone peak at the exact FFT bin,
filterbank partition-of-unity) and the Spark-facing operator ships a
CONTRACT the DuckDB oracle can check exactly — frame counts from the
closed-form formula and the dominant mel band of a synthesized pure
tone landing on the filter nearest its mel value.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def hann(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def frame_signal(x: np.ndarray, frame: int, hop: int) -> np.ndarray:
    """(n,) -> (n_frames, frame); tail that doesn't fill a frame drops.
    n_frames = 1 + (n - frame) // hop for n >= frame else 0."""
    n = len(x)
    if n < frame:
        return np.zeros((0, frame), dtype=np.float64)
    n_frames = 1 + (n - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[idx].astype(np.float64)


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int, n_fft: int, rate: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filters on the mel scale."""
    fmax = fmax or rate / 2.0
    edges_hz = mel_to_hz(
        np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    )
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
    fb = np.zeros((n_mels, len(freqs)))
    for k in range(n_mels):
        lo, mid, hi = edges_hz[k], edges_hz[k + 1], edges_hz[k + 2]
        rise = (freqs - lo) / max(mid - lo, 1e-12)
        fall = (hi - freqs) / max(hi - mid, 1e-12)
        fb[k] = np.clip(np.minimum(rise, fall), 0.0, None)
    return fb


def log_mel_spectrogram(
    samples: np.ndarray,
    rate: int,
    frame: int = 512,
    hop: int = 256,
    n_mels: int = 40,
) -> np.ndarray:
    """int16 samples -> (n_frames, n_mels) log-mel energies."""
    frames = frame_signal(samples.astype(np.float64), frame, hop)
    if not len(frames):
        return np.zeros((0, n_mels))
    spec = np.abs(np.fft.rfft(frames * hann(frame)[None, :], axis=1)) ** 2
    mel = spec @ mel_filterbank(n_mels, frame, rate).T
    return np.log(mel + 1e-10)


def dominant_mel_band(mels: np.ndarray) -> int:
    """Filter index with the highest total energy across frames."""
    return int(np.argmax(np.exp(mels).sum(axis=0)))


def nearest_mel_filter(f_hz: float, n_mels: int, rate: int) -> int:
    """Closed-form: the filter whose CENTER mel is nearest to mel(f) —
    where a pure tone's energy must land (the contract the oracle
    checks).  Centers sit at the interior points of the mel grid."""
    centers = np.linspace(hz_to_mel(0.0), hz_to_mel(rate / 2.0), n_mels + 2)[1:-1]
    return int(np.argmin(np.abs(centers - hz_to_mel(f_hz))))


FEATURE_DDL = (
    "doc_id LONG, n_frames LONG, dominant_band INT, expected_band INT, "
    "band_ok BOOLEAN"
)


def extract_log_mel(
    media: DataFrame,
    frame: int = 512,
    hop: int = 256,
    n_mels: int = 40,
    tone_hz_col: str = "tone_hz",
) -> DataFrame:
    """Per-clip log-mel features with the pure-tone contract columns:
    ``n_frames`` (exact), ``dominant_band`` (argmax filter), and
    ``band_ok`` = dominant within one filter of the closed-form
    nearest-center band for the clip's known tone frequency."""
    from iceberg_geo_poc_spark.operators.multimodal import decode_audio

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfr, dom, exp, ok = [], [], [], [], []
            for did, payload, fmt, tone in zip(
                pdf["doc_id"], pdf["payload"], pdf["format"], pdf[tone_hz_col]
            ):
                samples, rate = decode_audio(payload, fmt)
                mels = log_mel_spectrogram(samples, rate, frame, hop, n_mels)
                d = dominant_mel_band(mels) if len(mels) else -1
                e = nearest_mel_filter(float(tone), n_mels, rate)
                ids.append(int(did))
                nfr.append(len(mels))
                dom.append(d)
                exp.append(e)
                ok.append(abs(d - e) <= 1)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "n_frames": pd.array(nfr, dtype="int64"),
                    "dominant_band": pd.array(dom, dtype="int32"),
                    "expected_band": pd.array(exp, dtype="int32"),
                    "band_ok": ok,
                }
            )

    return media.mapInPandas(_batches, FEATURE_DDL)


# --------------------------------------------------------------- MFCC

def dct_ortho(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n, n): row k dotted with a length-n
    signal gives coefficient k.  Orthonormal scaling (k=0 row by
    sqrt(1/n), others sqrt(2/n)) makes C @ C.T == I exactly — the
    inverse transform is the transpose, and the L2 norm is preserved
    (the Parseval check extract_mfcc pins per clip)."""
    k = np.arange(n)[:, None]
    t = (np.arange(n)[None, :] + 0.5) * np.pi / n
    c = np.cos(k * t) * np.sqrt(2.0 / n)
    c[0] *= np.sqrt(0.5)
    return c


def mfcc_from_log_mel(mels: np.ndarray, n_coeff: int = 13) -> np.ndarray:
    """(n_frames, n_mels) log-mel energies -> (n_frames, n_coeff)
    cepstral coefficients (DCT-II over the mel axis — the classical
    MFCC front-end step after operators/audio_features.log_mel)."""
    if not len(mels):
        return np.zeros((0, n_coeff))
    c = dct_ortho(mels.shape[1])
    return mels @ c.T[:, :n_coeff]


MFCC_DDL = (
    "doc_id LONG, n_frames LONG, expected_band INT, band_ok BOOLEAN, "
    "norm_ok BOOLEAN"
)


def extract_mfcc(
    media: DataFrame,
    frame: int = 512,
    hop: int = 256,
    n_mels: int = 40,
    tone_hz_col: str = "tone_hz",
) -> DataFrame:
    """Per-clip MFCC contract columns.  The full-rank cepstrum is
    computed (n_coeff == n_mels), inverted through the transpose, and
    the reconstructed log-mel's dominant band must still match the
    closed-form nearest-center band — proving decode -> framing ->
    FFT -> filterbank -> DCT -> inverse-DCT end-to-end.  ``norm_ok``
    pins Parseval: the cepstral L2 norm equals the log-mel L2 norm to
    1e-9 relative (orthonormality of the DCT actually used)."""
    from iceberg_geo_poc_spark.operators.multimodal import decode_audio

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfr, exp, ok, nok = [], [], [], [], []
            for did, payload, fmt, tone in zip(
                pdf["doc_id"], pdf["payload"], pdf["format"], pdf[tone_hz_col]
            ):
                samples, rate = decode_audio(payload, fmt)
                mels = log_mel_spectrogram(samples, rate, frame, hop, n_mels)
                coeffs = mfcc_from_log_mel(mels, n_coeff=n_mels)
                recon = coeffs @ dct_ortho(n_mels)
                d = dominant_mel_band(recon) if len(recon) else -1
                e = nearest_mel_filter(float(tone), n_mels, rate)
                a, b = float(np.sum(coeffs**2)), float(np.sum(mels**2))
                ids.append(int(did))
                nfr.append(len(mels))
                exp.append(e)
                ok.append(abs(d - e) <= 1)
                nok.append(abs(a - b) <= 1e-9 * max(b, 1.0))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "n_frames": pd.array(nfr, dtype="int64"),
                    "expected_band": pd.array(exp, dtype="int32"),
                    "band_ok": ok,
                    "norm_ok": nok,
                }
            )

    return media.mapInPandas(_batches, MFCC_DDL)
