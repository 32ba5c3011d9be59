"""Deployable serving artifacts: serialized StableHLO program + weights.

The reference's deployable is a TorchScript ``best_model.pth``
(reference: pytorch/train_pytorch.py:177-181 — ``torch.jit.script`` of the
best model, loadable without the training code). The TPU-native equivalent
is ``jax.export``: the Predictor's jitted ``frames -> peaks`` program —
forward pass, optional int8 serving rewrite, and on-device peak decode,
with the weights baked in as constants — serialized as versioned portable
StableHLO. The artifact is self-contained: any JAX process can load and run
it (TPU or CPU) without this package's model code, and its compatibility is
governed by StableHLO's forward-compatibility window rather than by Python
pickling.

File format: ``PEATPU01`` magic, 4-byte little-endian JSON header length,
JSON header (shapes, decode, model type, platforms), then the
``jax.export`` blob.

Usage::

    python -m pose_estimation_amitai_tpu export cfg.json ckpt model.pexp
    ...
    from pose_estimation_amitai_tpu.deploy import load_exported
    predictor = load_exported("model.pexp")
    peaks = predictor(frames)            # (N, 3, K), any N — chunked+padded
"""

from __future__ import annotations

import json
import struct

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

MAGIC = b"PEATPU01"


def export_predictor(predictor, path: str, platforms=None) -> dict:
    """Serialize ``predictor``'s decode program (weights embedded) to
    ``path``.

    ``platforms``: lowering platforms for the artifact (default: try
    ``("cpu", "tpu")`` so one artifact serves both; fall back to the
    current backend if multi-platform lowering is rejected for this
    program).
    """
    assert not predictor.return_heatmaps, (
        "export serves the peaks program; build the Predictor with "
        "return_heatmaps=False"
    )
    if predictor._needs_cams:
        raise ValueError(
            f"{predictor.cfg.model_type} takes per-sample camera matrices "
            "(x, P, P_inv); the exported artifact serves a frames-only "
            "program — serve this family through infer.Predictor instead"
        )
    cs = predictor.chunk_size
    ishape = predictor._image_shape
    spec = jax.ShapeDtypeStruct((cs, *ishape), jnp.float32)

    def serve(frames):
        return predictor._run(predictor.variables, frames)

    tried = [tuple(platforms)] if platforms else [("cpu", "tpu"), None]
    exp, used, err = None, None, None
    for plats in tried:
        try:
            exp = jax_export.export(jax.jit(serve), platforms=plats)(spec)
            used = plats or (jax_export.default_export_platform(),)
            break
        except Exception as e:  # multi-platform lowering can be rejected
            err = e
    if exp is None:
        raise RuntimeError(f"export failed: {err!r}")

    header = {
        "format": "pose-estimation-amitai-tpu/exported-predictor",
        "chunk_size": int(cs),
        "image_shape": [int(v) for v in ishape],
        "model_type": predictor.cfg.model_type,
        "platforms": list(used),
        "out_shape": [int(v) for v in exp.out_avals[0].shape],
    }
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(exp.serialize())
    return header


class ExportedPredictor:
    """Chunked inference driver around a deserialized export.

    Mirrors ``Predictor.__call__``'s contract: (N, H, W, C) frames for any
    N -> (N, 3, K) [x, y, val] peaks; the tail chunk is zero-padded to the
    artifact's static chunk size (one compilation, no shape churn).
    """

    def __init__(self, exported, header: dict):
        self.header = header
        self.chunk_size = int(header["chunk_size"])
        self.image_shape = tuple(header["image_shape"])
        self._run = jax.jit(exported.call)

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        n = frames.shape[0]
        cs = self.chunk_size
        assert tuple(frames.shape[1:]) == self.image_shape, (
            f"frames {frames.shape[1:]} != exported {self.image_shape}"
        )
        outs = []
        for i in range(0, n, cs):
            chunk = np.asarray(frames[i : i + cs], np.float32)
            pad = cs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), np.float32)]
                )
            outs.append(np.asarray(self._run(jnp.asarray(chunk)))[: cs - pad])
        if outs:
            return np.concatenate(outs, axis=0)
        # empty input: keep the exported output rank/K so callers can
        # concatenate per-segment results
        out_shape = self.header["out_shape"]
        return np.zeros((0, *out_shape[1:]), np.float32)


def load_exported(path: str) -> ExportedPredictor:
    """Load an artifact written by :func:`export_predictor`."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path}: not an exported-predictor artifact")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode())
        blob = f.read()
    return ExportedPredictor(jax_export.deserialize(blob), header)
