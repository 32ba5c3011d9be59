"""Reference-checkpoint importer parity (round-2 verdict missing #2).

Ground truth is produced live:

* torch side — state_dict-compatible replicas of the reference modules
  (same attribute names => same checkpoint keys; semantics per
  pytorch/CNNs.py:9-186, pytorch/VITs.py:13-58+197-229,
  pytorch/pytorch_vit_encoder.py:12-149) run in eval mode on random
  weights; the imported flax model must reproduce their outputs.
* keras side — an .h5 written in the keras ``model_weights`` layout with
  random weights; ground truth is an independent lax-op oracle
  implementing the keras graph semantics (SAME correlations,
  gradient-of-conv transposed convs, LeakyReLU(0.01), SAME max-pool) per
  tensorflow/Network.py:416-474.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from pose_estimation_amitai_tpu.importers import (
    import_keras_h5,
    import_reference_checkpoint,
    import_torch_checkpoint,
)

torch = pytest.importorskip("torch")
nn = torch.nn


# ---------------------------------------------------------------------------
# torch replicas (reference attribute names -> reference state_dict keys)
# ---------------------------------------------------------------------------
class _RefEncoder(nn.Module):
    """pytorch/CNNs.py:9-88 active forward (bn built but bypassed)."""

    def __init__(self, cin, f, k=3, d=2):
        super().__init__()

        def conv(i, o):
            return nn.Conv2d(i, o, k, padding=d, dilation=d)

        widths = [(cin, f), (f, f), (f, f),
                  (f, 2 * f), (2 * f, 2 * f), (2 * f, 2 * f),
                  (2 * f, 4 * f), (4 * f, 4 * f), (4 * f, 4 * f)]
        for n_, (i, o) in enumerate(widths, start=1):
            setattr(self, f"conv{n_}", conv(i, o))
            setattr(self, f"bn{n_}", nn.BatchNorm2d(o))  # unused, key parity
        self.maxpool = nn.MaxPool2d(2, 2)
        self.leakyrelu = nn.LeakyReLU(0.1)

    def forward(self, x):
        a = self.leakyrelu
        x1 = a(self.conv1(x))
        x2 = a(self.conv2(x1)) + x1
        x3 = a(self.conv3(x2)) + x2
        x = a(self.maxpool(x3))
        x4 = a(self.conv4(x))
        x5 = a(self.conv5(x4)) + x4
        x6 = a(self.conv6(x5)) + x5
        x = a(self.maxpool(x6))
        x7 = a(self.conv7(x))
        x8 = a(self.conv8(x7)) + x7
        x9 = a(self.conv9(x8)) + x8
        return x9


class _RefDecoder(nn.Module):
    """pytorch/CNNs.py:92-157 active forward."""

    def __init__(self, cin, cout, k=3):
        super().__init__()
        h = cin // 2
        self.conv2dTranspose1 = nn.ConvTranspose2d(
            cin, h, k, stride=2, padding=1, output_padding=1)
        self.conv2dTranspose2 = nn.ConvTranspose2d(h, h, k, stride=1, padding=1)
        self.conv2dTranspose3 = nn.ConvTranspose2d(h, h, k, stride=1, padding=1)
        self.conv2dTranspose4 = nn.ConvTranspose2d(
            h, cout, k, stride=2, padding=1, output_padding=1)
        self.leakyrelu = nn.LeakyReLU(0.1)

    def forward(self, x):
        a = self.leakyrelu
        x1 = a(self.conv2dTranspose1(x))
        x2 = a(self.conv2dTranspose2(x1)) + x1
        x3 = a(self.conv2dTranspose3(x2)) + x2
        return a(self.conv2dTranspose4(x3))


class _RefBasicNet(nn.Module):
    def __init__(self, cin, cout, f=8):
        super().__init__()
        self.encoder = _RefEncoder(cin, f)
        self.decoder = _RefDecoder(4 * f, cout)

    def forward(self, x):
        return self.decoder(self.encoder(x))


def _apply_flax(imported, x_nchw):
    model = imported.build_model(dtype=jnp.float32)
    xj = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    out = model.apply({"params": jax.tree_util.tree_map(jnp.asarray,
                                                        imported.params)},
                      xj, train=False)
    return np.transpose(np.asarray(out), (0, 3, 1, 2))


def _peaks(maps_nchw):
    n, c, _, w = maps_nchw.shape
    flat = maps_nchw.reshape(n, c, -1).argmax(-1)
    return np.stack(np.divmod(flat, w), axis=-1)


@pytest.mark.quick
def test_torch_basicnet_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(0)
    net = _RefBasicNet(4, 6).eval()
    x = torch.rand(2, 4, 48, 48)
    with torch.no_grad():
        ref = net(x).numpy()

    path = str(tmp_path / "checkpoint.pth")
    torch.save({"epoch": 3, "model_state_dict": net.state_dict(),
                "loss": 0.1}, path)
    imported = import_torch_checkpoint(path)
    assert imported.model_kind == "basic_cnn"
    assert imported.arch_flavor == "torch"
    assert imported.arch_kwargs["out_channels"] == 6
    got = _apply_flax(imported, x.numpy())
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(_peaks(got), _peaks(ref))


@pytest.mark.quick
def test_torchscript_best_model_roundtrip(tmp_path):
    """best_model.pth is TorchScript (pytorch/train_pytorch.py:177-181)."""
    torch.manual_seed(1)
    net = _RefBasicNet(4, 5).eval()
    x = torch.rand(1, 4, 48, 48)
    with torch.no_grad():
        ref = net(x).numpy()
    path = str(tmp_path / "best_model.pth")
    torch.jit.script(net).save(path)
    imported = import_reference_checkpoint(path)  # auto-detect route
    got = _apply_flax(imported, x.numpy())
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# torch ViT replica
# ---------------------------------------------------------------------------
class _RefAttention(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.norm = nn.LayerNorm(dim)
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(0.0))

    def forward(self, x):
        x = self.norm(x)
        qkv = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = [t.reshape(t.shape[0], t.shape[1], self.heads, -1)
                   .permute(0, 2, 1, 3) for t in qkv]
        attn = torch.softmax(q @ k.transpose(-1, -2) * self.scale, dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3)
        out = out.reshape(out.shape[0], out.shape[1], -1)
        return self.to_out(out)


class _RefFeedForward(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.net = nn.Sequential(
            nn.LayerNorm(dim), nn.Linear(dim, hidden), nn.GELU(),
            nn.Dropout(0.0), nn.Linear(hidden, dim), nn.Dropout(0.0))

    def forward(self, x):
        return self.net(x)


class _RefTransformer(nn.Module):
    def __init__(self, dim, depth, heads, dim_head, mlp_dim):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.layers = nn.ModuleList([
            nn.ModuleList([_RefAttention(dim, heads, dim_head),
                           _RefFeedForward(dim, mlp_dim)])
            for _ in range(depth)])

    def forward(self, x):
        for attn, ff in self.layers:
            x = attn(x) + x
            x = ff(x) + x
        return self.norm(x)


class _RefCustomViT(nn.Module):
    def __init__(self, img, p, dim, depth, heads, dim_head, mlp_dim, cin=4):
        super().__init__()
        n = (img // p) ** 2
        self.patch_size = p
        self.patch_dim = cin * p * p
        self.patch_to_embedding = nn.Linear(self.patch_dim, dim)
        self.norm = nn.LayerNorm(dim)
        self.pos_embedding = nn.Parameter(torch.randn(1, n, dim))
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim))  # unused
        self.transformer = _RefTransformer(dim, depth, heads, dim_head, mlp_dim)

    def forward(self, img):
        b, c, _, _ = img.shape
        p = self.patch_size
        patches = img.unfold(2, p, p).unfold(3, p, p)
        patches = patches.contiguous().view(b, c, -1, p, p)
        patches = patches.permute(0, 2, 1, 3, 4).contiguous()
        patches = patches.view(b, -1, self.patch_dim)
        x = self.norm(self.patch_to_embedding(patches))
        x = x + self.pos_embedding[:, : x.size(1)]
        return self.transformer(x)


class _RefViTDecoder(nn.Module):
    """pytorch/VITs.py:13-58 incl. the scrambled token reshape (line 40)."""

    def __init__(self, dim, cout, grid, k=3):
        super().__init__()
        self.dim, self.grid = dim, grid

        def dc(i, o):
            return nn.ConvTranspose2d(i, o, k, stride=2, padding=1,
                                      output_padding=1)

        self.deconv1 = dc(dim, dim)
        self.deconv2 = dc(dim, dim)
        self.deconv3 = dc(dim, dim)
        self.deconv4 = dc(dim, cout)
        self.leakyrelu = nn.LeakyReLU(0.1)

    def forward(self, x):
        x = x.reshape(-1, self.dim, self.grid, self.grid)
        a = self.leakyrelu
        x = a(self.deconv1(x))
        x = a(self.deconv2(x))
        x = a(self.deconv3(x))
        x = a(self.deconv4(x))
        return (x - x.min()) / (x.max() - x.min())


class _RefViTNet(nn.Module):
    def __init__(self, img=48, p=16, dim=36, depth=2, heads=2, cout=5):
        super().__init__()
        self.vit_encoder = _RefCustomViT(img, p, dim, depth, heads,
                                         dim_head=dim, mlp_dim=dim * 4)
        self.cnn_decoder = _RefViTDecoder(dim, cout, grid=img // p)

    def forward(self, x):
        return self.cnn_decoder(self.vit_encoder(x))


@pytest.mark.quick
def test_torch_vit_checkpoint_roundtrip(tmp_path):
    """VIT_encoder_CNN_decoder import, incl. the reference's scrambled
    token-grid reshape (pytorch/VITs.py:40) via ref_token_grid=True.
    Batch 1 so the reference's batch-global min-max equals the rebuild's
    per-sample normalisation."""
    torch.manual_seed(2)
    net = _RefViTNet().eval()
    x = torch.rand(1, 4, 48, 48)
    with torch.no_grad():
        ref = net(x).numpy()

    path = str(tmp_path / "vit_checkpoint.pth")
    torch.save({"model_state_dict": net.state_dict()}, path)
    imported = import_torch_checkpoint(path)
    assert imported.model_kind == "vit"
    assert imported.arch_kwargs["ref_token_grid"] is True
    assert imported.arch_kwargs["patch_size"] == 16
    assert imported.arch_kwargs["depth"] == 2
    got = _apply_flax(imported, x.numpy())
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(_peaks(got), _peaks(ref))


@pytest.mark.quick
def test_torch_vit_dim_head_override(tmp_path):
    """(heads, dim_head) is shape-ambiguous when inner is a multiple of
    both dim and 64 (advisor r3): the default guess warns, and the
    explicit ``dim_head`` override recovers the true split with exact
    output parity."""

    class _Net(nn.Module):
        def __init__(self):
            super().__init__()
            # trained with 'dim head' falsy: dim_head=64, heads=2 at
            # dim=128 -> inner=128 is divisible by BOTH dim and 64
            self.vit_encoder = _RefCustomViT(48, 16, 128, 1, heads=2,
                                             dim_head=64, mlp_dim=256)
            self.cnn_decoder = _RefViTDecoder(128, 4, grid=3)

        def forward(self, x):
            return self.cnn_decoder(self.vit_encoder(x))

    torch.manual_seed(6)
    net = _Net().eval()
    x = torch.rand(1, 4, 48, 48)
    with torch.no_grad():
        ref = net(x).numpy()
    path = str(tmp_path / "ambig_vit.pth")
    torch.save(net.state_dict(), path)

    with pytest.warns(UserWarning, match="divisible by both"):
        guessed = import_torch_checkpoint(path)
    assert guessed.arch_kwargs["dim_head"] == 128  # shape-valid but wrong
    assert guessed.arch_kwargs["heads"] == 1

    fixed = import_torch_checkpoint(path, dim_head=64)
    assert fixed.arch_kwargs["dim_head"] == 64
    assert fixed.arch_kwargs["heads"] == 2
    got = _apply_flax(fixed, x.numpy())
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(_peaks(got), _peaks(ref))


# ---------------------------------------------------------------------------
# keras .h5 (no TF in the image: file written in keras layout, ground
# truth from an independent lax-op oracle of the keras graph)
# ---------------------------------------------------------------------------
def _write_keras_h5(path, enc_weights, dec_weights):
    """Emit the nested-model layout keras produces for basic_nn
    (model_weights/<submodel> groups with weight_names attrs)."""
    import h5py

    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        mw.attrs["layer_names"] = [b"x_in", b"Encoder2DAtrous", b"Decoder2D"]
        mw.create_group("x_in")

        def fill(gname, weights):
            g = mw.create_group(gname)
            names = []
            for i, (kern, bias) in enumerate(weights):
                lname = "conv2d" if i == 0 else f"conv2d_{i}"
                kn = f"{gname}/{lname}/kernel:0"
                bn = f"{gname}/{lname}/bias:0"
                g.create_dataset(kn, data=kern)
                g.create_dataset(bn, data=bias)
                names += [kn.encode(), bn.encode()]
            g.attrs["weight_names"] = names

        fill("Encoder2DAtrous", enc_weights)
        fill("Decoder2D", dec_weights)


def _k_conv(v, kern, bias, dil=1):
    return lax.conv_general_dilated(
        v, jnp.asarray(kern), (1, 1), "SAME",
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias


def _k_tf_deconv(v, kern, bias):
    # tf.nn.conv2d_transpose == grad of SAME stride-2 conv2d whose
    # filter is the keras kernel read as (kh, kw, I, O)
    b, h, w, _ = v.shape
    cout = kern.shape[2]
    x0 = jnp.zeros((b, h * 2, w * 2, cout))
    _, vjp = jax.vjp(
        lambda t: lax.conv_general_dilated(
            t, jnp.asarray(kern), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x0)
    return vjp(v)[0] + bias


def _k_leaky(v):
    return jnp.where(v > 0, v, 0.01 * v)


def _enc_oracle(x, enc_weights, nb):
    """keras Encoder2DAtrous semantics (tensorflow/Network.py:416-447)."""
    idx = 0
    v = jnp.asarray(x)
    for _ in range(nb):
        v = _k_leaky(_k_conv(v, *enc_weights[idx], dil=2)); idx += 1
        v = _k_leaky(_k_conv(v, *enc_weights[idx], dil=2)); idx += 1
        v = _k_conv(v, *enc_weights[idx], dil=2); idx += 1
        v = jax.nn.relu(lax.reduce_window(
            v, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"))
    for _ in range(3):
        v = _k_leaky(_k_conv(v, *enc_weights[idx], dil=2)); idx += 1
    return v


def _dec_oracle(v, dec_weights, nb):
    """keras Decoder2D semantics (tensorflow/Network.py:449-474)."""
    idx = 0
    for _ in range(nb - 1, 0, -1):
        v = _k_leaky(_k_tf_deconv(v, *dec_weights[idx])); idx += 1
        v = _k_leaky(_k_conv(v, *dec_weights[idx])); idx += 1
        v = _k_leaky(_k_conv(v, *dec_weights[idx])); idx += 1
    return _k_tf_deconv(v, *dec_weights[idx])


def _keras_oracle(x, enc_weights, dec_weights, nb):
    """Independent keras-semantics basic_nn forward
    (tensorflow/Network.py:127-145)."""
    return np.asarray(_dec_oracle(_enc_oracle(x, enc_weights, nb),
                                  dec_weights, nb))


@pytest.mark.quick
def _gen_keras_cnn_weights(rng, f0, enc_in, head_out, nb, dec_in_ratio=1):
    """Random keras-layout encoder/decoder weights; ``dec_in_ratio`` is the
    decoder-input width multiple of the encoder latent (1 basic, 2 two
    wings, 1+N N-camera fusion — tensorflow/Network.py:74-375)."""

    def w(kh, kw, i, o):
        return (rng.normal(0, 0.15, (kh, kw, i, o)).astype(np.float32),
                rng.normal(0, 0.05, (o,)).astype(np.float32))

    enc = []
    c = enc_in
    for b in range(nb):
        f = f0 * 2 ** b
        enc += [w(3, 3, c, f), w(3, 3, f, f), w(3, 3, f, f)]
        c = f
    f = f0 * 2 ** nb
    enc += [w(3, 3, c, f), w(3, 3, f, f), w(3, 3, f, f)]
    dec = []
    c = f * dec_in_ratio
    for b in range(nb - 1, 0, -1):
        f = f0 * 2 ** b
        dec += [(rng.normal(0, 0.15, (3, 3, f, c)).astype(np.float32),
                 rng.normal(0, 0.05, (f,)).astype(np.float32)),
                w(3, 3, f, f), w(3, 3, f, f)]
        c = f
    dec += [(rng.normal(0, 0.15, (3, 3, head_out, c)).astype(np.float32),
             rng.normal(0, 0.05, (head_out,)).astype(np.float32))]
    return enc, dec


def test_keras_h5_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    f0, cin, cout, nb = 8, 4, 6, 2
    enc, dec = _gen_keras_cnn_weights(rng, f0, cin, cout, nb)

    path = str(tmp_path / "best_model.h5")
    _write_keras_h5(path, enc, dec)

    imported = import_reference_checkpoint(path)
    assert imported.model_kind == "basic_cnn"
    assert imported.arch_flavor == "tf"
    assert imported.arch_kwargs == dict(
        out_channels=cout, filters=f0, kernel_size=3, dilation=2,
        num_blocks=nb, in_channels=cin)

    x = rng.random((2, 48, 48, cin)).astype(np.float32)
    ref = _keras_oracle(x, enc, dec, nb)
    model = imported.build_model(dtype=jnp.float32)
    got = np.asarray(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, imported.params)},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.quick
def test_keras_two_wings_h5_roundtrip(tmp_path):
    """two_wings_net .h5 (tensorflow/Network.py:200-243): same nested
    submodels, decoder input 2x the latent — detected from the weights and
    routed to TwoWingsNet; output parity vs a composed keras oracle."""
    rng = np.random.default_rng(11)
    f0, nb, t, head_out = 8, 2, 3, 4
    enc, dec = _gen_keras_cnn_weights(rng, f0, t + 1, head_out, nb,
                                      dec_in_ratio=2)
    path = str(tmp_path / "two_wings.h5")
    _write_keras_h5(path, enc, dec)

    imported = import_reference_checkpoint(path)
    assert imported.model_kind == "two_wings"
    assert imported.arch_kwargs["out_channels"] == 2 * head_out
    assert imported.arch_kwargs["in_channels"] == t + 2

    x = rng.random((2, 48, 48, t + 2)).astype(np.float32)
    w1 = x[..., list(range(t)) + [t]]
    w2 = x[..., list(range(t)) + [t + 1]]
    c1 = _enc_oracle(w1, enc, nb)
    c2 = _enc_oracle(w2, enc, nb)
    m1 = _dec_oracle(jnp.concatenate([c1, c2], -1), dec, nb)
    m2 = _dec_oracle(jnp.concatenate([c2, c1], -1), dec, nb)
    ref = np.asarray(jnp.concatenate([m1, m2], -1))

    model = imported.build_model(dtype=jnp.float32)
    got = np.asarray(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, imported.params)},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.quick
def test_keras_all_4_cams_h5_roundtrip(tmp_path):
    """all_4_cams .h5 (tensorflow/Network.py:321-375): decoder input 5x
    the latent -> MultiCamNet tf flavour; parity vs a composed oracle."""
    rng = np.random.default_rng(12)
    f0, nb, cpv, head_out = 8, 2, 4, 2
    enc, dec = _gen_keras_cnn_weights(rng, f0, cpv, head_out, nb,
                                      dec_in_ratio=5)
    path = str(tmp_path / "all_4_cams.h5")
    _write_keras_h5(path, enc, dec)

    imported = import_reference_checkpoint(path)
    assert imported.model_kind == "multicam"
    assert imported.arch_flavor == "tf"
    assert imported.arch_kwargs["num_cams"] == 4
    assert imported.arch_kwargs["out_channels"] == 4 * head_out

    x = rng.random((2, 48, 48, 4 * cpv)).astype(np.float32)
    encs = [_enc_oracle(x[..., i * cpv:(i + 1) * cpv], enc, nb)
            for i in range(4)]
    merged = jnp.concatenate(encs, -1)
    outs = [_dec_oracle(jnp.concatenate([e, merged], -1), dec, nb)
            for e in encs]
    ref = np.asarray(jnp.concatenate(outs, -1))

    model = imported.build_model(dtype=jnp.float32)
    got = np.asarray(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, imported.params)},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def _write_keras_h5_nested_c2f(path, enc1, dec1, enc2, dec2):
    """Emit the C2F_per_wing save layout (tensorflow/Network.py:169-198):
    the frozen coarse model rides as a NESTED sub-model group (its own
    ``layer_names`` attr), followed by the fine stack's sub-models."""
    import h5py

    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        mw.attrs["layer_names"] = [
            b"x_in", b"coarse_per_wing", b"concatenate",
            b"Encoder2DAtrous2", b"Decoder2D2",
        ]
        mw.create_group("x_in")
        mw.create_group("concatenate")

        def fill(parent, gname, weights):
            g = parent.create_group(gname)
            names = []
            for i, (kern, bias) in enumerate(weights):
                lname = "conv2d" if i == 0 else f"conv2d_{i}"
                kn = f"{gname}/{lname}/kernel:0"
                bn = f"{gname}/{lname}/bias:0"
                g.create_dataset(kn, data=kern)
                g.create_dataset(bn, data=bias)
                names += [kn.encode(), bn.encode()]
            g.attrs["weight_names"] = names

        nested = mw.create_group("coarse_per_wing")
        nested.attrs["layer_names"] = [b"Encoder2DAtrous1", b"Decoder2D1"]
        fill(nested, "Encoder2DAtrous1", enc1)
        fill(nested, "Decoder2D1", dec1)
        fill(mw, "Encoder2DAtrous2", enc2)
        fill(mw, "Decoder2D2", dec2)


@pytest.mark.quick
def test_keras_c2f_h5_roundtrip(tmp_path):
    """C2F_per_wing .h5 (tensorflow/Network.py:169-198): the frozen coarse
    basic_nn stack (always nb=3, Network.py:147) nested inside the save,
    then the fine stack over concat(x, coarse confmaps) — split detected
    from the kernel sequence, routed to C2FPerWing, parity vs composed
    keras oracles."""
    rng = np.random.default_rng(21)
    cin, coarse_out, fine_out = 4, 5, 6
    f0c, nb1 = 4, 3
    f0f, nb2 = 8, 2
    enc1, dec1 = _gen_keras_cnn_weights(rng, f0c, cin, coarse_out, nb1)
    enc2, dec2 = _gen_keras_cnn_weights(rng, f0f, cin + coarse_out,
                                        fine_out, nb2)
    path = str(tmp_path / "c2f.h5")
    _write_keras_h5_nested_c2f(path, enc1, dec1, enc2, dec2)

    imported = import_reference_checkpoint(path)
    assert imported.model_kind == "c2f"
    assert imported.arch_flavor == "tf"
    kw = imported.arch_kwargs
    assert kw["coarse_num_blocks"] == nb1 and kw["num_blocks"] == nb2
    assert kw["coarse_out_channels"] == coarse_out
    assert kw["out_channels"] == fine_out
    assert kw["coarse_filters"] == f0c and kw["filters"] == f0f
    assert kw["in_channels"] == cin

    x = rng.random((2, 48, 48, cin)).astype(np.float32)
    coarse_maps = _keras_oracle(x, enc1, dec1, nb1)
    ref = _keras_oracle(np.concatenate([x, coarse_maps], -1), enc2, dec2,
                        nb2)
    model = imported.build_model(dtype=jnp.float32)
    got = np.asarray(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, imported.params)},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.quick
def test_keras_coarse_per_wing_imports_as_basic(tmp_path):
    """coarse_per_wing .h5 (tensorflow/Network.py:147-167) is structurally
    a basic_nn at num_blocks=3 — pinned to import via the basic_cnn path
    with the 3-block pyramid recovered from the weight sequence."""
    rng = np.random.default_rng(22)
    f0, cin, cout, nb = 4, 4, 7, 3
    enc, dec = _gen_keras_cnn_weights(rng, f0, cin, cout, nb)
    path = str(tmp_path / "coarse.h5")
    _write_keras_h5(path, enc, dec)

    imported = import_reference_checkpoint(path)
    assert imported.model_kind == "basic_cnn"
    assert imported.arch_flavor == "tf"
    assert imported.arch_kwargs["num_blocks"] == 3

    x = rng.random((2, 48, 48, cin)).astype(np.float32)
    ref = _keras_oracle(x, enc, dec, nb)
    model = imported.build_model(dtype=jnp.float32)
    got = np.asarray(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, imported.params)},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# keras resnet50_encoder_shallow_decoder (tensorflow/Network.py:377-414)
# ---------------------------------------------------------------------------
def _gen_keras_resnet_weights(rng, stem=4, stage_sizes=(3, 4, 6, 3),
                              cin=4, cout=3, k=3):
    """Random keras-applications-ResNet50-layout trunk + 5 deconvs."""

    def conv(i, o, kk):
        return {"kernel": rng.normal(0, 0.1, (kk, kk, i, o)).astype(np.float32),
                "bias": rng.normal(0, 0.02, (o,)).astype(np.float32)}

    def bnw(c):
        return {"gamma": rng.uniform(0.5, 1.5, c).astype(np.float32),
                "beta": rng.normal(0, 0.1, c).astype(np.float32),
                "moving_mean": rng.normal(0, 0.1, c).astype(np.float32),
                "moving_variance": rng.uniform(0.5, 1.5, c).astype(np.float32)}

    entries = [("conv1_conv", conv(cin, stem, 7)), ("conv1_bn", bnw(stem))]
    c = stem
    for s, blocks in enumerate(stage_sizes):
        filters = stem * 2 ** s
        for b in range(1, blocks + 1):
            name = f"conv{s + 2}_block{b}"
            if b == 1:
                entries += [(f"{name}_0_conv", conv(c, 4 * filters, 1)),
                            (f"{name}_0_bn", bnw(4 * filters))]
            entries += [(f"{name}_1_conv", conv(c, filters, 1)),
                        (f"{name}_1_bn", bnw(filters)),
                        (f"{name}_2_conv", conv(filters, filters, 3)),
                        (f"{name}_2_bn", bnw(filters)),
                        (f"{name}_3_conv", conv(filters, 4 * filters, 1)),
                        (f"{name}_3_bn", bnw(4 * filters))]
            c = 4 * filters
    deconvs, dc = [], c
    for _ in range(4):
        o = dc // 2
        deconvs.append((rng.normal(0, 0.1, (k, k, o, dc)).astype(np.float32),
                        rng.normal(0, 0.02, (o,)).astype(np.float32)))
        dc = o
    deconvs.append((rng.normal(0, 0.1, (k, k, cout, dc)).astype(np.float32),
                    rng.normal(0, 0.02, (cout,)).astype(np.float32)))
    return entries, deconvs


def _write_keras_resnet_h5(path, entries, deconvs):
    """resnet50_encoder_shallow_decoder save layout: the keras ResNet50
    rides as ONE nested sub-model group; deconvs are top-level layers."""
    import h5py

    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        dec_names = ["conv2d_transpose" if i == 0 else f"conv2d_transpose_{i}"
                     for i in range(len(deconvs))]
        mw.attrs["layer_names"] = [b"x_in", b"resnet50"] + [
            n.encode() for n in dec_names]
        mw.create_group("x_in")
        g = mw.create_group("resnet50")
        wn = []
        for lay, parts in entries:
            for leaf, arr in parts.items():
                n = f"{lay}/{leaf}:0"
                g.create_dataset(n, data=arr)
                wn.append(n.encode())
        g.attrs["weight_names"] = wn
        for lname, (kern, bias) in zip(dec_names, deconvs):
            g2 = mw.create_group(lname)
            g2.create_dataset(f"{lname}/kernel:0", data=kern)
            g2.create_dataset(f"{lname}/bias:0", data=bias)
            g2.attrs["weight_names"] = [f"{lname}/kernel:0".encode(),
                                        f"{lname}/bias:0".encode()]


def _keras_resnet_oracle(x, entries, deconvs, stage_sizes):
    """Independent lax-op oracle of the keras-applications ResNet50 v1
    graph (explicit (3,3)/(1,1) stem/pool zero-pads, biased convs,
    BN eps 1.001e-5, stride on block1's FIRST 1x1) + the reference's
    5 LeakyReLU(0.01) deconvs (tensorflow/Network.py:377-414)."""
    d = dict(entries)
    eps = 1.001e-5

    def conv(v, name, stride=1, same=False):
        w, b = d[name]["kernel"], d[name]["bias"]
        return lax.conv_general_dilated(
            v, jnp.asarray(w), (stride, stride),
            "SAME" if same else "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    def bn(v, name):
        p = d[name]
        return (p["gamma"] * (v - p["moving_mean"])
                / np.sqrt(p["moving_variance"] + eps) + p["beta"])

    v = jnp.asarray(np.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0))))
    v = jax.nn.relu(bn(conv(v, "conv1_conv", 2), "conv1_bn"))
    v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-np.inf)
    v = lax.reduce_window(v, -jnp.inf, lax.max, (1, 3, 3, 1),
                          (1, 2, 2, 1), "VALID")
    for s, blocks in enumerate(stage_sizes):
        for b in range(1, blocks + 1):
            name = f"conv{s + 2}_block{b}"
            stride = 2 if (s > 0 and b == 1) else 1
            if b == 1:
                sc = bn(conv(v, f"{name}_0_conv", stride), f"{name}_0_bn")
            else:
                sc = v
            y = jax.nn.relu(bn(conv(v, f"{name}_1_conv", stride),
                               f"{name}_1_bn"))
            y = jax.nn.relu(bn(conv(y, f"{name}_2_conv", same=True),
                               f"{name}_2_bn"))
            y = bn(conv(y, f"{name}_3_conv"), f"{name}_3_bn")
            v = jax.nn.relu(y + sc)
    for kern, bias in deconvs:
        v = _k_leaky(_k_tf_deconv(v, kern, bias))
    return np.asarray(v)


@pytest.mark.quick
def test_keras_resnet50_h5_roundtrip(tmp_path):
    """resnet50_encoder_shallow_decoder .h5: keras ResNet50 trunk (BN
    running stats included) + 5 deconvs -> ResNetHeatmapNet(flavor='tf'),
    output parity vs an independent lax oracle of the keras graph."""
    rng = np.random.default_rng(31)
    stem, stages, cin, cout = 4, (3, 4, 6, 3), 4, 3
    entries, deconvs = _gen_keras_resnet_weights(rng, stem, stages, cin, cout)
    path = str(tmp_path / "resnet.h5")
    _write_keras_resnet_h5(path, entries, deconvs)

    imported = import_reference_checkpoint(path)
    assert imported.model_kind == "resnet"
    assert imported.arch_flavor == "tf"
    kw = imported.arch_kwargs
    assert kw["stem_features"] == stem
    assert kw["stage_sizes"] == list(stages)
    assert kw["out_channels"] == cout and kw["in_channels"] == cin
    assert imported.batch_stats and "encoder" in imported.batch_stats

    x = rng.random((2, 64, 64, cin)).astype(np.float32)
    ref = _keras_resnet_oracle(x, entries, deconvs, stages)
    model = imported.build_model(dtype=jnp.float32)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, imported.params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray,
                                              imported.batch_stats),
    }
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# torchvision resnet50 state_dict -> ImageNet encoder init
# (pytorch/NNs warehouse/NNs.py:20 models.resnet50(pretrained=True))
# ---------------------------------------------------------------------------
class _TVBottleneck(nn.Module):
    """torchvision Bottleneck structure/naming (v1.5: stride on conv2)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TVResNet50(nn.Module):
    """torchvision ``resnet50`` attribute layout (conv1/bn1/layer1-4/fc)
    so ``state_dict()`` keys match torchvision's exactly."""

    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for i, (planes, n) in enumerate(zip((64, 128, 256, 512), layers)):
            stride = 1 if i == 0 else 2
            ds = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4),
            )
            blocks = [_TVBottleneck(inplanes, planes, stride, ds)]
            inplanes = planes * 4
            blocks += [_TVBottleneck(inplanes, planes)
                       for _ in range(1, n)]
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(inplanes, 10)  # present in sd, must be ignored

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def _randomize_torch(m, rng_seed=0):
    torch.manual_seed(rng_seed)
    with torch.no_grad():
        for p in m.parameters():
            p.normal_(0, 0.05)
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)


@pytest.mark.quick
def test_torchvision_resnet50_encoder_import(tmp_path):
    """A torchvision-layout resnet50 state_dict imports as encoder init
    (model_kind 'resnet_encoder') with EXACT trunk parity against the
    torch model — flavor='torch' pins the stem/pool/stride-2 padding
    phase torchvision uses (XLA SAME pads the opposite side)."""
    from pose_estimation_amitai_tpu.models.resnet import ResNet50Encoder

    layers = (1, 1, 1, 1)  # torchvision key layout, test-sized depth
    m = _TVResNet50(layers)
    _randomize_torch(m, 7)
    m.eval()
    path = str(tmp_path / "tv_resnet50.pth")
    torch.save(m.state_dict(), path)

    imported = import_reference_checkpoint(path)
    assert imported.model_kind == "resnet_encoder"
    assert imported.arch_flavor == "torch"
    assert imported.arch_kwargs["stage_sizes"] == list(layers)
    assert imported.arch_kwargs["in_channels"] == 3

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = m(x).numpy()

    enc = ResNet50Encoder(stage_sizes=layers, flavor="torch",
                          dtype=jnp.float32)
    variables = {
        "params": jax.tree_util.tree_map(
            jnp.asarray, imported.params["encoder"]),
        "batch_stats": jax.tree_util.tree_map(
            jnp.asarray, imported.batch_stats["encoder"]),
    }
    got = np.asarray(enc.apply(
        variables, jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        train=False))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref,
                               rtol=2e-3, atol=2e-4)

    # building a full model from an encoder-only import must fail loudly
    with pytest.raises(ValueError, match="ENCODER-INIT"):
        imported.build_model()


@pytest.mark.quick
def test_trainer_imagenet_resnet_encoder_init(tmp_path):
    """End-to-end warehouse capability (pytorch/NNs warehouse/NNs.py:20
    ``models.resnet50(pretrained=True)``): config ``resnet_flavor='torch'``
    + ``pretrained_encoder_path`` -> torchvision state_dict grafts the
    trunk weights AND BN running stats into the trainer's state, with the
    3-channel stem inflated to the dataset's channel count."""
    from pose_estimation_amitai_tpu import constants as C
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.data.synthetic import (
        make_synthetic_arrays,
    )
    from pose_estimation_amitai_tpu.importers import adapt_stem_in_channels
    from pose_estimation_amitai_tpu.train.trainer import Trainer

    m = _TVResNet50()  # full torchvision depth: matches the default trunk
    _randomize_torch(m, 11)
    path = str(tmp_path / "imagenet_resnet50.pth")
    torch.save(m.state_dict(), path)

    cfg = Config(
        model_type=C.RESNET_18_POINTS_PER_WING, resnet_flavor="torch",
        pretrained_encoder_path=path, epochs=1, batch_size=2,
        batches_per_epoch=1, base_output_path=str(tmp_path / "runs"),
        do_augmentations=False, val_fraction=0.5, seed=0,
    )
    arrays = make_synthetic_arrays(num_frames=4, num_points=6,
                                   image_size=48, seed=0)
    trainer = Trainer(cfg, arrays=arrays)

    enc = trainer.state.params["encoder"]
    tv_stem = np.transpose(m.state_dict()["conv1.weight"].numpy(),
                           (2, 3, 1, 0))
    want = adapt_stem_in_channels(tv_stem, enc["stem"]["kernel"].shape[2])
    np.testing.assert_allclose(np.asarray(enc["stem"]["kernel"],
                                          np.float32), want, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(enc["stage0_block0"]["conv2"]["kernel"], np.float32),
        np.transpose(m.state_dict()["layer1.0.conv2.weight"].numpy(),
                     (2, 3, 1, 0)), rtol=1e-6)
    bs = trainer.state.batch_stats["encoder"]
    np.testing.assert_allclose(
        np.asarray(bs["stem_bn"]["mean"], np.float32),
        m.state_dict()["bn1.running_mean"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bs["stage3_block0"]["bn3"]["var"], np.float32),
        m.state_dict()["layer4.0.bn3.running_var"].numpy(), rtol=1e-6)


def test_trainer_pretrained_encoder_from_snapshot_keeps_bn_stats(tmp_path):
    """review r4: pretrained_encoder_path pointing at a `cli import`
    SNAPSHOT (not the raw reference file) must graft BN running stats too
    — the params-only load_params fallback silently dropped them."""
    from pose_estimation_amitai_tpu import constants as C
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.data.synthetic import (
        make_synthetic_arrays,
    )
    from pose_estimation_amitai_tpu.importers import (
        import_reference_checkpoint,
        save_imported_snapshot,
    )
    from pose_estimation_amitai_tpu.train.trainer import Trainer

    m = _TVResNet50()
    _randomize_torch(m, 13)
    pth = str(tmp_path / "tv.pth")
    torch.save(m.state_dict(), pth)
    snap = str(tmp_path / "tv_snapshot.msgpack")
    save_imported_snapshot(import_reference_checkpoint(pth), snap)

    cfg = Config(
        model_type=C.RESNET_18_POINTS_PER_WING, resnet_flavor="torch",
        pretrained_encoder_path=snap, epochs=1, batch_size=2,
        batches_per_epoch=1, base_output_path=str(tmp_path / "runs"),
        do_augmentations=False, val_fraction=0.5, seed=0,
    )
    arrays = make_synthetic_arrays(num_frames=4, num_points=6,
                                   image_size=48, seed=0)
    trainer = Trainer(cfg, arrays=arrays)
    np.testing.assert_allclose(
        np.asarray(trainer.state.batch_stats["encoder"]["stem_bn"]["mean"],
                   np.float32),
        m.state_dict()["bn1.running_mean"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(
            trainer.state.batch_stats["encoder"]["stage2_block0"]["bn2"]
            ["var"], np.float32),
        m.state_dict()["layer3.0.bn2.running_var"].numpy(), rtol=1e-6)


@pytest.mark.quick
def test_trainer_c2f_coarse_from_reference_h5(tmp_path):
    """The reference's own C2F flow: ``coarse_model_path`` pointing at a
    TRAINED KERAS coarse save (tensorflow/Network.py:172-176) loads the
    frozen coarse stage directly from the .h5 (round-4: the path used to
    accept only native msgpack)."""
    from pose_estimation_amitai_tpu import constants as C
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.data.synthetic import (
        make_synthetic_arrays,
    )
    from pose_estimation_amitai_tpu.train.trainer import Trainer

    rng = np.random.default_rng(51)
    f0, cin, cout, nb = 4, 4, 5, 3
    enc, dec = _gen_keras_cnn_weights(rng, f0, cin, cout, nb)
    coarse_h5 = str(tmp_path / "coarse_sigma6.h5")
    _write_keras_h5(coarse_h5, enc, dec)

    cfg = Config(
        model_type=C.C2F_PER_WING, num_base_filters=f0,
        coarse_model_path=coarse_h5, epochs=1, batch_size=2,
        batches_per_epoch=1, base_output_path=str(tmp_path / "runs"),
        do_augmentations=False, val_fraction=0.5, seed=0,
    )
    arrays = make_synthetic_arrays(num_frames=4, num_points=8,
                                   image_size=48, seed=0)
    trainer = Trainer(cfg, arrays=arrays)
    coarse = trainer.state.params["coarse"]
    np.testing.assert_allclose(
        np.asarray(coarse["encoder"]["block0_conv1"]["kernel"],
                   np.float32), enc[0][0], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(coarse["decoder"]["head_deconv"]["bias"], np.float32),
        dec[-1][1], rtol=1e-6)


@pytest.mark.quick
def test_encoder_only_snapshot_refuses_to_serve(tmp_path):
    """An encoder-init import (torchvision trunk) must fail LOUDLY when
    used as a full serving model — both from the raw .pth and from its
    `cli import` snapshot."""
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.importers import (
        import_reference_checkpoint,
        save_imported_snapshot,
    )
    from pose_estimation_amitai_tpu.infer import Predictor

    m = _TVResNet50((1, 1, 1, 1))
    _randomize_torch(m, 17)
    pth = str(tmp_path / "tv.pth")
    torch.save(m.state_dict(), pth)
    snap = str(tmp_path / "tv_snap.msgpack")
    save_imported_snapshot(import_reference_checkpoint(pth), snap)

    for ckpt in (pth, snap):
        with pytest.raises(ValueError, match="ENCODER-INIT"):
            Predictor.from_checkpoint(
                Config(), ckpt, image_shape=(48, 48, 3),
                num_output_channels=5,
            )


@pytest.mark.quick
def test_adapt_stem_in_channels_grayscale_parity():
    """Channel inflation invariant: equal-channel (grayscale-replicated)
    inputs produce exactly the original RGB-trunk response."""
    from pose_estimation_amitai_tpu.importers import adapt_stem_in_channels

    rng = np.random.default_rng(3)
    k3 = rng.normal(0, 0.1, (7, 7, 3, 8)).astype(np.float32)
    k4 = adapt_stem_in_channels(k3, 4)
    assert k4.shape == (7, 7, 4, 8)
    gray = rng.random((1, 16, 16, 1)).astype(np.float32)

    def conv(v, k):
        return np.asarray(lax.conv_general_dilated(
            jnp.asarray(v), jnp.asarray(k), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))

    ref = conv(np.repeat(gray, 3, axis=-1), k3)
    got = conv(np.repeat(gray, 4, axis=-1), k4)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.quick
def test_import_snapshot_roundtrip(tmp_path):
    """`cli import` writes a self-describing payload (params + BN stats +
    arch metadata); Predictor.from_checkpoint rebuilds the exact model
    from it — no reference file, no config-derived architecture
    (advisor r3: a bare-params dump silently dropped batch_stats and the
    fidelity flags)."""
    from pose_estimation_amitai_tpu.cli import main as cli_main
    from pose_estimation_amitai_tpu.importers import load_imported_snapshot
    from pose_estimation_amitai_tpu.infer import Predictor
    from pose_estimation_amitai_tpu.config import Config

    rng = np.random.default_rng(33)
    stem, stages, cin, cout = 4, (1, 1, 1, 1), 4, 3
    entries, deconvs = _gen_keras_resnet_weights(rng, stem, stages, cin, cout)
    ref_path = str(tmp_path / "resnet.h5")
    _write_keras_resnet_h5(ref_path, entries, deconvs)
    out_path = str(tmp_path / "imported.msgpack")
    assert cli_main(["import", ref_path, out_path]) == 0

    snap = load_imported_snapshot(out_path)
    assert snap is not None and snap.model_kind == "resnet"
    assert snap.arch_kwargs["stage_sizes"] == list(stages)
    assert snap.batch_stats and "encoder" in snap.batch_stats

    x = rng.random((2, 64, 64, cin)).astype(np.float32)
    ref = _keras_resnet_oracle(x, entries, deconvs, stages)
    # from_checkpoint on the SNAPSHOT (not the reference file): the model
    # must come from the embedded metadata, not from cfg (whose defaults
    # describe the flagship CNN)
    pred = Predictor.from_checkpoint(
        Config(), out_path, image_shape=(64, 64, cin),
        chunk_size=2, return_heatmaps=True,
    )
    maps, _ = pred(x)
    np.testing.assert_allclose(maps, ref, rtol=2e-2, atol=2e-3)


@pytest.mark.quick
def test_cli_infer_with_imported_reference_checkpoint(tmp_path):
    """End-to-end verdict item: ``cli infer --import-reference`` consumes a
    reference torch checkpoint directly, and ``--mat`` adds the MATLAB
    artifact (tensorflow/CallBacks.py:26-27 dialect)."""
    from scipy.io import loadmat

    from pose_estimation_amitai_tpu import constants as C
    from pose_estimation_amitai_tpu.cli import main as cli_main
    from pose_estimation_amitai_tpu.data.synthetic import write_synthetic_h5

    data = str(tmp_path / "data.h5")
    write_synthetic_h5(data, num_frames=3, num_points=8, image_size=48)

    # per-wing 18-pnts path on the synthetic set: 4-ch input, 5 confmap
    # channels ((8-2)/2 wing points + head/tail)
    torch.manual_seed(3)
    net = _RefBasicNet(4, 5).eval()
    ckpt = str(tmp_path / "checkpoint.pth")
    torch.save({"model_state_dict": net.state_dict()}, ckpt)

    cfg_path = str(tmp_path / "config.json")
    import json as _json

    with open(cfg_path, "w") as f:
        _json.dump({"model type": C.MODEL_18_POINTS_PER_WING,
                    "batch size": 4}, f)

    out = str(tmp_path / "preds.npz")
    rc = cli_main(["infer", cfg_path, ckpt, data, out,
                   "--import-reference", "--mat", "--chunk-size", "8"])
    assert rc == 0
    with np.load(out) as z:
        pts = z["points_2d"]
        assert pts.shape[1] == 3  # (S, 3, K)
        assert "points_3d" in z.files
    mat = loadmat(str(tmp_path / "preds.mat"))
    assert mat["points_2d"].shape == pts.shape


@pytest.mark.quick
def test_cli_infer_with_keras_resnet_and_c2f_saves(tmp_path):
    """End-to-end: ``cli infer`` consumes the round-4 keras families
    (resnet50_encoder_shallow_decoder with BN stats, C2F_per_wing with the
    nested frozen-coarse stack) directly from the .h5."""
    import json as _json

    from pose_estimation_amitai_tpu import constants as C
    from pose_estimation_amitai_tpu.cli import main as cli_main
    from pose_estimation_amitai_tpu.data.synthetic import write_synthetic_h5

    data = str(tmp_path / "data.h5")
    write_synthetic_h5(data, num_frames=2, num_points=8, image_size=48)
    rng = np.random.default_rng(41)

    # resnet50 family (5 confmap channels on the per-wing synthetic set)
    entries, deconvs = _gen_keras_resnet_weights(
        rng, stem=4, stage_sizes=(1, 1, 1, 1), cin=4, cout=5)
    resnet_h5 = str(tmp_path / "resnet.h5")
    _write_keras_resnet_h5(resnet_h5, entries, deconvs)

    # C2F family
    enc1, dec1 = _gen_keras_cnn_weights(rng, 4, 4, 3, 3)
    enc2, dec2 = _gen_keras_cnn_weights(rng, 4, 4 + 3, 5, 2)
    c2f_h5 = str(tmp_path / "c2f.h5")
    _write_keras_h5_nested_c2f(c2f_h5, enc1, dec1, enc2, dec2)

    for mt, ckpt in ((C.RESNET_18_POINTS_PER_WING, resnet_h5),
                     (C.C2F_PER_WING, c2f_h5)):
        cfg_path = str(tmp_path / f"config_{mt}.json")
        with open(cfg_path, "w") as f:
            _json.dump({"model type": mt, "batch size": 4}, f)
        out = str(tmp_path / f"preds_{mt}.npz")
        rc = cli_main(["infer", cfg_path, ckpt, data, out,
                       "--chunk-size", "8"])
        assert rc == 0, mt
        with np.load(out) as z:
            pts = z["points_2d"]
            assert pts.shape[1:] == (3, 5), mt
            assert np.isfinite(pts).all(), mt


@pytest.mark.quick
def test_cli_import_subcommand_roundtrip(tmp_path):
    """``cli import`` converts to a self-describing native snapshot
    (params + arch metadata, importers.save_imported_snapshot) that
    load_imported_snapshot restores to the identical ImportedModel."""
    from pose_estimation_amitai_tpu.cli import main as cli_main
    from pose_estimation_amitai_tpu.importers import load_imported_snapshot

    torch.manual_seed(4)
    net = _RefBasicNet(4, 6).eval()
    ckpt = str(tmp_path / "best_model.pth")
    torch.jit.script(net).save(ckpt)

    out = str(tmp_path / "imported.msgpack")
    rc = cli_main(["import", ckpt, out], )
    assert rc == 0

    imported = import_torch_checkpoint(ckpt)
    snap = load_imported_snapshot(out)
    assert snap is not None
    assert snap.model_kind == imported.model_kind
    assert snap.arch_flavor == imported.arch_flavor
    assert snap.arch_kwargs == imported.arch_kwargs
    for tree in ("encoder", "decoder"):
        for k, v in imported.params[tree].items():
            np.testing.assert_array_equal(
                snap.params[tree][k]["kernel"], v["kernel"])


# ---------------------------------------------------------------------------
# torch 4-camera replicas
# ---------------------------------------------------------------------------
class _RefFourCams(nn.Module):
    """FourCamerasBaseLine semantics (pytorch/CNNs.py:189-237)."""

    def __init__(self, cin_per_view, cout, f=8):
        super().__init__()
        self.shared_encoder = _RefEncoder(cin_per_view, f)
        self.shared_conv2d = nn.Conv2d(16 * f, 16 * f, 1, padding=0)
        self.shared_decoder = _RefDecoder(20 * f, cout // 4)
        self.cpv = cin_per_view

    def forward(self, x):
        views = torch.split(x, self.cpv, dim=1)
        encs = [self.shared_encoder(v) for v in views]
        merged = torch.cat(encs, dim=1)
        merged = self.shared_conv2d(merged) + merged
        outs = [self.shared_decoder(torch.cat([e, merged], dim=1))
                for e in encs]
        return torch.cat(outs, dim=1)


class _RefDisentangled(nn.Module):
    """FourCamerasDisentanglement semantics incl. the raw-memory FTL
    reshapes and active BatchNorms (pytorch/CNNs.py:240-352)."""

    def __init__(self, cin_per_view, cout, f=8, latent=30):
        super().__init__()
        self.shared_encoder = _RefEncoder(cin_per_view, f)
        ec = 4 * f
        canon = latent // 3 * 4
        self.rearrange_layer_1 = nn.Conv2d(ec, latent, 1, padding=0)
        self.fusion_layer_1 = nn.Conv2d(4 * canon, canon, 1, padding=0)
        self.fusion_layer_2 = nn.Conv2d(canon, canon, 1, padding=0)
        self.batch_norm1 = nn.BatchNorm2d(canon)
        self.batch_norm2 = nn.BatchNorm2d(canon)
        self.batch_norm3 = nn.BatchNorm2d(latent)
        self.rearrange_layer_2 = nn.Conv2d(latent, ec, 1, padding=0)
        self.shared_decoder = _RefDecoder(ec, cout // 4)
        self.relu = nn.ReLU()
        self.cpv = cin_per_view

    @staticmethod
    def _inv_ftl(x, P_inv):
        b, c, h, w = x.shape
        z = torch.reshape(x, (b, h, w, c // 3, 3, 1))
        out = torch.reshape(P_inv, (b, 1, 1, 1, 4, 3)) @ z
        return torch.reshape(out, (b, 4 * c // 3, h, w))

    @staticmethod
    def _ftl(x, P):
        b, c, h, w = x.shape
        z = torch.reshape(x, (b, h, w, c // 4, 4, 1))
        out = torch.reshape(P, (b, 1, 1, 1, 3, 4)) @ z
        return torch.reshape(out, (b, 3 * c // 4, h, w))

    def forward(self, x, P, P_inv):
        views = torch.split(x, self.cpv, dim=1)
        firsts = [self.shared_encoder(v) for v in views]
        encs = [self.rearrange_layer_1(e) for e in firsts]
        canon = [self._inv_ftl(encs[i], P_inv[:, i]) for i in range(4)]
        fusion = torch.cat(canon, dim=1)
        fusion = self.relu(self.batch_norm1(self.fusion_layer_1(fusion)))
        fusion = self.relu(self.batch_norm2(self.fusion_layer_2(fusion)))
        outs = []
        for i in range(4):
            ent = self.relu(self.batch_norm3(self._ftl(fusion, P[:, i])))
            ent = self.rearrange_layer_2(ent)
            outs.append(self.shared_decoder(ent + firsts[i]))
        return torch.cat(outs, dim=1)


@pytest.mark.quick
def test_torch_multicam_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(5)
    net = _RefFourCams(4, 8).eval()
    x = torch.rand(2, 16, 48, 48)
    with torch.no_grad():
        ref = net(x).numpy()
    path = str(tmp_path / "four_cams.pth")
    torch.save({"model_state_dict": net.state_dict()}, path)
    imported = import_torch_checkpoint(path)
    assert imported.model_kind == "multicam"
    assert imported.arch_kwargs["out_channels"] == 8
    got = _apply_flax(imported, x.numpy())
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(_peaks(got), _peaks(ref))


@pytest.mark.quick
def test_torch_disentangled_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(6)
    net = _RefDisentangled(4, 8)
    # non-trivial BN running stats (a trained checkpoint's would be)
    with torch.no_grad():
        for bn in (net.batch_norm1, net.batch_norm2, net.batch_norm3):
            bn.running_mean.uniform_(-0.2, 0.2)
            bn.running_var.uniform_(0.5, 1.5)
    net = net.eval()
    x = torch.rand(2, 16, 48, 48)
    P = torch.rand(2, 4, 3, 4) * 0.5
    P_inv = torch.linalg.pinv(P)
    with torch.no_grad():
        ref = net(x, P, P_inv).numpy()

    path = str(tmp_path / "disentangled.pth")
    torch.save({"model_state_dict": net.state_dict()}, path)
    imported = import_torch_checkpoint(path)
    assert imported.model_kind == "disentangled"
    assert imported.arch_kwargs["ref_ftl_layout"] is True
    assert imported.arch_kwargs["latent_3d_channels"] == 30
    assert imported.batch_stats is not None

    model = imported.build_model(dtype=jnp.float32)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, imported.params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray,
                                              imported.batch_stats),
    }
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = model.apply(variables, xj, jnp.asarray(P.numpy()),
                      jnp.asarray(P_inv.numpy()), train=False)
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(_peaks(got), _peaks(ref))


# ---------------------------------------------------------------------------
# keras TF ViT (vitPose.py) — h5 in keras layout, pure-jax keras oracle
# ---------------------------------------------------------------------------
def _write_keras_vit_h5(path, embed, pos, blocks, deconvs):
    """keras model_weights layout for vision_transformer: Dense embed,
    Embedding positions, per block [MultiHeadAttention(q/k/v/o), LN,
    Dense, Dense, LN], then 4 Conv2DTranspose."""
    import h5py

    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        names = [b"patch_extraction_layer", b"dense"]
        g = mw.create_group("patch_extraction_layer")
        g.attrs["weight_names"] = []

        def put(gname, items):
            grp = mw.create_group(gname)
            wn = []
            for relname, arr in items:
                grp.create_dataset(relname, data=arr)
                wn.append(relname.encode())
            grp.attrs["weight_names"] = wn

        put("dense", [("dense/kernel:0", embed[0]),
                      ("dense/bias:0", embed[1])])
        names.append(b"embedding")
        put("embedding", [("embedding/embeddings:0", pos)])
        di = 1
        for bi, blk in enumerate(blocks):
            mha_name = f"multi_head_attention_{bi}" if bi else "multi_head_attention"
            names.append(mha_name.encode())
            put(mha_name, [
                (f"{mha_name}/query/kernel:0", blk["q"][0]),
                (f"{mha_name}/query/bias:0", blk["q"][1]),
                (f"{mha_name}/key/kernel:0", blk["k"][0]),
                (f"{mha_name}/key/bias:0", blk["k"][1]),
                (f"{mha_name}/value/kernel:0", blk["v"][0]),
                (f"{mha_name}/value/bias:0", blk["v"][1]),
                (f"{mha_name}/attention_output/kernel:0", blk["o"][0]),
                (f"{mha_name}/attention_output/bias:0", blk["o"][1]),
            ])
            ln1 = f"layer_normalization_{2 * bi}" if bi else "layer_normalization"
            names.append(ln1.encode())
            put(ln1, [(f"{ln1}/gamma:0", blk["ln1"][0]),
                      (f"{ln1}/beta:0", blk["ln1"][1])])
            for fc in ("fc1", "fc2"):
                dn = f"dense_{di}"
                di += 1
                names.append(dn.encode())
                put(dn, [(f"{dn}/kernel:0", blk[fc][0]),
                         (f"{dn}/bias:0", blk[fc][1])])
            ln2 = f"layer_normalization_{2 * bi + 1}"
            names.append(ln2.encode())
            put(ln2, [(f"{ln2}/gamma:0", blk["ln2"][0]),
                      (f"{ln2}/beta:0", blk["ln2"][1])])
        for i, (kern, bias) in enumerate(deconvs):
            cn = f"conv2d_transpose_{i}" if i else "conv2d_transpose"
            names.append(cn.encode())
            put(cn, [(f"{cn}/kernel:0", kern), (f"{cn}/bias:0", bias)])
        mw.attrs["layer_names"] = names


def _keras_vit_oracle(x, embed, pos, blocks, deconvs, p):
    """keras-semantics forward of vitPose.vision_transformer in raw lax:
    extract_patches (ph, pw, c order), Dense embed, +pos, post-LN blocks
    with keras MHA (biased, scaled by key_dim^-0.5, eps=1e-6 LNs), relu
    FFN, then 4 stride-2 SAME conv2d_transpose (gradient-of-conv) with
    LeakyReLU(0.1)."""
    b, h, w, c = x.shape
    g = h // p
    # extract_patches: (B, gh, gw, ph*pw*c) with (ph, pw, c) flattening
    xt = jnp.asarray(x).reshape(b, g, p, g, p, c)
    patches = jnp.transpose(xt, (0, 1, 3, 2, 4, 5)).reshape(
        b, g * g, p * p * c
    )
    t = patches @ embed[0] + embed[1]
    t = t + pos[None]

    def ln(v, gamma, beta):
        mu = v.mean(-1, keepdims=True)
        var = ((v - mu) ** 2).mean(-1, keepdims=True)
        return (v - mu) / jnp.sqrt(var + 1e-6) * gamma + beta

    for blk in blocks:
        qk, qb = blk["q"]
        kk, kb = blk["k"]
        vk, vb = blk["v"]
        ok, ob = blk["o"]
        q = jnp.einsum("bnd,dhe->bnhe", t, qk) + qb
        k = jnp.einsum("bnd,dhe->bnhe", t, kk) + kb
        v = jnp.einsum("bnd,dhe->bnhe", t, vk) + vb
        scale = qk.shape[-1] ** -0.5
        logits = jnp.einsum("bnhe,bmhe->bhnm", q, k) * scale
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhnm,bmhe->bnhe", attn, v)
        o = jnp.einsum("bnhe,hed->bnd", o, ok) + ob
        t = ln(t + o, *blk["ln1"])
        f1 = jax.nn.relu(t @ blk["fc1"][0] + blk["fc1"][1])
        f2 = f1 @ blk["fc2"][0] + blk["fc2"][1]
        t = ln(t + f2, *blk["ln2"])

    y = t.reshape(b, g, g, t.shape[-1])

    def tf_deconv(v, kern, bias):
        bb, hh, ww, _ = v.shape
        cout = kern.shape[2]
        x0 = jnp.zeros((bb, hh * 2, ww * 2, cout))
        _, vjp = jax.vjp(
            lambda s: lax.conv_general_dilated(
                s, jnp.asarray(kern), (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")), x0)
        return vjp(v)[0] + bias

    for kern, bias in deconvs:
        y = tf_deconv(y, kern, bias)
        y = jnp.where(y > 0, y, 0.1 * y)  # LeakyReLU(0.1), vitPose.py:89-96
    return np.asarray(y)


@pytest.mark.quick
def test_keras_vit_h5_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    p, dim, heads, dim_head, depth, cout, cin = 16, 24, 2, 24, 2, 5, 4
    hw = 48
    n = (hw // p) ** 2
    inner = heads * dim_head

    def W(*shape, s=0.1):
        return rng.normal(0, s, shape).astype(np.float32)

    embed = (W(p * p * cin, dim), W(dim))
    pos = W(n, dim)
    blocks = []
    for _ in range(depth):
        blocks.append({
            "q": (W(dim, heads, dim_head), W(heads, dim_head)),
            "k": (W(dim, heads, dim_head), W(heads, dim_head)),
            "v": (W(dim, heads, dim_head), W(heads, dim_head)),
            "o": (W(heads, dim_head, dim), W(dim)),
            "ln1": (1.0 + W(dim), W(dim)),
            "ln2": (1.0 + W(dim), W(dim)),
            "fc1": (W(dim, 4 * dim), W(4 * dim)),
            "fc2": (W(4 * dim, dim), W(dim)),
        })
    widths = [dim // 2, dim // 4, dim // 8, cout]
    deconvs = []
    c = dim
    for wd in widths:
        deconvs.append((W(3, 3, wd, c), W(wd)))
        c = wd

    path = str(tmp_path / "vit_model.h5")
    _write_keras_vit_h5(path, embed, pos, blocks, deconvs)

    imported = import_reference_checkpoint(path)
    assert imported.model_kind == "vit"
    assert imported.arch_flavor == "tf"
    assert imported.arch_kwargs["patch_size"] == p
    assert imported.arch_kwargs["depth"] == depth
    assert imported.arch_kwargs["dim_head"] == dim_head

    x = rng.random((2, hw, hw, cin)).astype(np.float32)
    ref = _keras_vit_oracle(x, embed, pos, blocks, deconvs, p)
    model = imported.build_model(dtype=jnp.float32)
    got = np.asarray(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, imported.params)},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.quick
def test_finetune_from_reference_selfsup_checkpoint(tmp_path):
    """pretrained_encoder_path accepts a REFERENCE torch checkpoint (the
    pre_trained_leap.pth re-heading flow, NNs warehouse/NNs.py:38-62):
    the encoder subtree is converted and loaded, the decoder stays fresh."""
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.data.synthetic import make_synthetic_arrays
    from pose_estimation_amitai_tpu.train.trainer import Trainer

    torch.manual_seed(8)
    net = _RefBasicNet(4, 4).eval()  # selfsup autoencoder: 4 -> 4 channels
    ckpt = str(tmp_path / "pre_trained_leap.pth")
    torch.save(net.state_dict(), ckpt)  # raw state_dict save

    arrays = make_synthetic_arrays(num_frames=4, num_points=8, image_size=48)
    cfg = Config(
        epochs=1, batch_size=4, batches_per_epoch=1, num_base_filters=8,
        base_output_path=str(tmp_path), do_augmentations=False, seed=0,
        pretrained_encoder_path=ckpt, val_fraction=0.5,
    )
    trainer = Trainer(cfg, arrays=arrays)
    imported = import_torch_checkpoint(ckpt)
    got = trainer.state.params["encoder"]["conv1"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        imported.params["encoder"]["conv1"]["kernel"], rtol=1e-6, atol=1e-6,
    )
    history = trainer.train()
    assert np.isfinite(history["train_loss"][0])


def test_imported_checkpoint_serves_quantized_with_peak_parity(tmp_path):
    """Capstone interop check: an imported reference checkpoint rides the
    hand-scheduled int8-resident serving path and its decoded peaks match
    the torch float forward (the reference's own serving semantics)."""
    from pose_estimation_amitai_tpu.config import Config
    from pose_estimation_amitai_tpu.infer import Predictor

    torch.manual_seed(9)
    net = _RefBasicNet(4, 6, f=16).eval()
    x = torch.rand(8, 4, 48, 48)
    with torch.no_grad():
        ref_maps = net(x).numpy()
    ref_pk = _peaks(ref_maps)  # (N, C, 2) [y, x]

    ckpt = str(tmp_path / "best_model.pth")
    torch.jit.script(net).save(ckpt)

    frames = np.transpose(x.numpy(), (0, 2, 3, 1))
    pred = Predictor.from_checkpoint(
        Config(), ckpt, image_shape=frames.shape[1:],
        num_output_channels=6, chunk_size=8,
        use_quantized=True, calibration_frames=frames,
    )
    assert pred.serving_path == "int8_resident"
    pts = np.asarray(pred(frames))  # (N, 3, K) [x, y, val]
    got = np.stack([pts[:, 1, :], pts[:, 0, :]], axis=-1)  # -> [y, x]
    d = np.linalg.norm(got - ref_pk, axis=-1)
    assert np.median(d) <= 1.0, np.median(d)


@pytest.mark.quick
def test_snapshot_magic_and_legacy_detection(tmp_path):
    """advisor r4: snapshot detection must not hinge on a substring scan
    of flax's msgpack key insertion order. New files carry an explicit
    file magic; legacy magic-less files are detected by structurally
    decoding the first msgpack map key; near-miss files (first key merely
    *starting* with 'format') are rejected."""
    from flax import serialization

    from pose_estimation_amitai_tpu.importers import (
        IMPORT_SNAPSHOT_FORMAT,
        IMPORT_SNAPSHOT_MAGIC,
        ImportedModel,
        load_imported_snapshot,
        save_imported_snapshot,
    )
    from pose_estimation_amitai_tpu.train import checkpoint as ckpt

    imported = ImportedModel(
        params={"encoder": {"w": np.arange(6, dtype=np.float32)}},
        model_kind="basic_cnn", arch_flavor="tf",
        arch_kwargs={"out_channels": 3, "in_channels": 4},
    )

    # new-format file: magic prefix present, loads through both readers
    path = str(tmp_path / "snap.msgpack")
    save_imported_snapshot(imported, path)
    with open(path, "rb") as f:
        assert f.read(len(IMPORT_SNAPSHOT_MAGIC)) == IMPORT_SNAPSHOT_MAGIC
    snap = load_imported_snapshot(path)
    assert snap is not None and snap.model_kind == "basic_cnn"
    params = ckpt.load_params(path)  # generic reader strips the magic
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["w"]), imported.params["encoder"]["w"]
    )

    # legacy magic-less file (written by rounds <= 4): still recognised
    legacy = str(tmp_path / "legacy.msgpack")
    payload = {
        "format": IMPORT_SNAPSHOT_FORMAT,
        "params": imported.params,
        "batch_stats": {},
        "meta": json.dumps({
            "model_kind": "basic_cnn", "arch_flavor": "tf",
            "arch_kwargs": imported.arch_kwargs,
        }),
    }
    with open(legacy, "wb") as f:
        f.write(serialization.to_bytes(payload))
    snap = load_imported_snapshot(legacy)
    assert snap is not None and snap.arch_flavor == "tf"

    # near-miss: first map key 'formatter' must NOT be detected (the old
    # 64-byte substring scan false-positived on this)
    near = str(tmp_path / "near.msgpack")
    with open(near, "wb") as f:
        f.write(serialization.to_bytes({"formatter": {"x": np.zeros(2)}}))
    assert load_imported_snapshot(near) is None

    # garbage / truncated files: None, no exception
    junk = str(tmp_path / "junk.bin")
    with open(junk, "wb") as f:
        f.write(b"\x81")
    assert load_imported_snapshot(junk) is None
