"""Faithful PyTorch replica of the reference's flagship net + train loop,
run on the SAME synthetic arrays as the JAX reference-regime runs.

Purpose (round-1 verdict #6 closure): the reference's committed debug-run
anchors (best val L2 3.44 px) come from its lab-internal dataset, which is
unavailable. What IS testable without that data is whether the rebuild's
training path optimises as fast as the reference implementation on
identical inputs. This script rebuilds the reference's architecture and
loop in torch, verbatim semantics:

* Encoder2DAtrous active forward (reference: pytorch/CNNs.py:9-88):
  3 stages x 3 dilated (d=2) convs, LeakyReLU(0.1), residual skips between
  consecutive same-width convs, BatchNorm constructed-but-bypassed, 2x2
  maxpool after stages 1-2; filters f, 2f, 4f.
* Decoder2d active forward (pytorch/CNNs.py:92-157): stride-2 deconv, two
  stride-1 deconvs with skips, stride-2 head deconv, LeakyReLU everywhere.
* Train loop (pytorch/train_pytorch.py:98-197): Adam lr 1e-3, MSELoss,
  batch 5, gradient accumulation 3, shuffled index ring, argmax-decode
  val pixel L2.

It consumes a cached arrays .npz produced by parity_reference_regime.py
and goes through the rebuild's own Preprocessor (identical samples), then
trains in torch on CPU. Compare its per-epoch train loss / val L2 against
the JAX run on the same npz: matched curves exonerate the rebuild's train
path; a torch curve that escapes the background plateau much faster would
indict it. Measured result (RESULTS.md): the curves match — both
implementations show the same plateau-then-slow-descent dynamics on this
synthetic stand-in, confirming the reference's fast escape on its own
losses.csv was a property of the real data, not the framework.

Usage::

    python scripts/parity_torch_replica.py [--npz PATH] [--epochs N]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile

import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


class Enc(nn.Module):
    """Encoder2DAtrous active-forward semantics (pytorch/CNNs.py:9-88)."""

    def __init__(self, cin, f=64, dil=2):
        super().__init__()

        def c(i, o):
            return nn.Conv2d(i, o, 3, padding=dil, dilation=dil)

        self.s1 = nn.ModuleList([c(cin, f), c(f, f), c(f, f)])
        self.s2 = nn.ModuleList([c(f, 2 * f), c(2 * f, 2 * f), c(2 * f, 2 * f)])
        self.s3 = nn.ModuleList(
            [c(2 * f, 4 * f), c(4 * f, 4 * f), c(4 * f, 4 * f)]
        )
        self.pool = nn.MaxPool2d(2)
        self.act = nn.LeakyReLU(0.1)

    def forward(self, x):
        for si, stage in enumerate([self.s1, self.s2, self.s3]):
            x = self.act(stage[0](x))
            x = self.act(stage[1](x)) + x
            x = self.act(stage[2](x)) + x
            if si < 2:
                x = self.pool(x)
        return x


class Dec(nn.Module):
    """Decoder2d active-forward semantics (pytorch/CNNs.py:92-157)."""

    def __init__(self, cout, f=64):
        super().__init__()
        k = dict(kernel_size=3, padding=1)
        self.d1 = nn.ConvTranspose2d(4 * f, 2 * f, stride=2,
                                     output_padding=1, **k)
        self.d2 = nn.ConvTranspose2d(2 * f, 2 * f, stride=1, **k)
        self.d3 = nn.ConvTranspose2d(2 * f, 2 * f, stride=1, **k)
        self.d4 = nn.ConvTranspose2d(2 * f, cout, stride=2,
                                     output_padding=1, **k)
        self.act = nn.LeakyReLU(0.1)

    def forward(self, x):
        x1 = self.act(self.d1(x))
        x2 = self.act(self.d2(x1)) + x1
        x3 = self.act(self.d3(x2)) + x2
        return self.act(self.d4(x3))


class Net(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.e, self.d = Enc(cin), Dec(cout)

    def forward(self, x):
        return self.d(self.e(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--npz",
        default=str(pathlib.Path(tempfile.gettempdir())
                    / "parity_arrays_outline_v7.npz"),
        help="cached arrays from parity_reference_regime.py",
    )
    ap.add_argument("--epochs", type=int, default=60)
    args = ap.parse_args()

    torch.manual_seed(0)
    torch.set_num_threads(8)

    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.data.pipeline import build_dataset
    from scripts.parity_reference_regime import REFERENCE_CONFIG

    with np.load(args.npz) as z:
        arrays = {k: z[k] for k in z.files}
    cfg = Config.from_dict(REFERENCE_CONFIG).replace(
        arch_flavor="torch", dropout_ratio=0.0
    )
    ds, _ = build_dataset(cfg, arrays)  # identical preprocessing/samples
    bx = np.transpose(np.asarray(ds.data["box"], np.float32), (0, 3, 1, 2))
    cm = np.transpose(
        np.asarray(ds.data["confmaps"], np.float32), (0, 3, 1, 2)
    )
    sp = np.random.default_rng(1).permutation(len(bx))
    ntr = len(bx) // 2
    xt = torch.from_numpy(bx[sp[:ntr]])
    yt = torch.from_numpy(cm[sp[:ntr]])
    xv = torch.from_numpy(bx[sp[ntr:]])
    yv = torch.from_numpy(cm[sp[ntr:]])
    print(f"train {tuple(xt.shape)} val {tuple(xv.shape)}", flush=True)

    net = Net(xt.shape[1], yt.shape[1])
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    lossf = nn.MSELoss()
    rng = np.random.default_rng(0)
    B, ACC = 5, 3  # reference batch_size / accumulation_steps

    def val_l2():
        with torch.no_grad():
            p = net(xv).numpy()
        t = yv.numpy()
        n, c, _, W = p.shape
        pi = p.reshape(n, c, -1).argmax(-1)
        ti = t.reshape(n, c, -1).argmax(-1)
        py, px = np.divmod(pi, W)
        ty, tx = np.divmod(ti, W)
        return float(np.mean(np.hypot(py - ty, px - tx)))

    for epoch in range(args.epochs):
        idx = rng.permutation(len(xt))
        losses = []
        opt.zero_grad()
        for bi in range(10):  # reference: batches per epoch = 10
            lo = (bi * B) % len(xt)
            sel = idx[lo:lo + B]
            if len(sel) < B:
                sel = np.concatenate([sel, idx[: B - len(sel)]])
            loss = lossf(net(xt[sel]), yt[sel]) / ACC
            loss.backward()
            losses.append(float(loss.detach()) * ACC)
            if (bi + 1) % ACC == 0:
                opt.step()
                opt.zero_grad()
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(
                json.dumps(
                    {
                        "epoch": epoch + 1,
                        "train_loss": round(float(np.mean(losses)), 6),
                        "val_l2": round(val_l2(), 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
