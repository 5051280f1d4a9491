"""Converter parity: a plain-torch reimplementation of the reference
HRFormerBlock (LN -> windowed MHSA+RPE -> residual; LN -> CrossFFN ->
residual; `hrformer.py:18-386`) is built with the reference's torch
parameter names, converted via `pth_convert`, and must match this
framework's HRFormerBlock numerically."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from hrfuser_tpu.layers import HRFormerBlock
from hrfuser_tpu.ops.window import center_pad_shape, relative_position_index
from hrfuser_tpu.utils.pth_convert import (Converter, _convert_crossffn,
                                           _convert_hrformer_block,
                                           _unflatten)


class TorchWindowMSA(torch.nn.Module):
    """Fused-qkv window attention + relative position bias
    (`hrformer.py:18-131` semantics)."""

    def __init__(self, c, num_heads, ws):
        super().__init__()
        self.num_heads = num_heads
        self.ws = ws
        self.qkv = torch.nn.Linear(c, 3 * c)
        self.out_proj = torch.nn.Linear(c, c)
        self.relative_position_bias_table = torch.nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, num_heads) * 0.1)

    def forward(self, x):                     # x: [B_, N, C]
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        q, k, v = self.qkv(x).reshape(b, n, 3, h, hd).permute(
            2, 0, 3, 1, 4)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        idx = torch.from_numpy(
            np.asarray(relative_position_index(self.ws, self.ws)))
        bias = self.relative_position_bias_table[idx.reshape(-1)].reshape(
            n, n, h).permute(2, 0, 1)
        attn = torch.softmax(attn + bias[None], dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.out_proj(out)


class TorchBlock(torch.nn.Module):
    """HRFormerBlock with the reference's parameter names."""

    def __init__(self, c, num_heads, ws, mlp_ratio=4):
        super().__init__()
        self.ws = ws
        self.norm1 = torch.nn.LayerNorm(c, eps=1e-6)
        self.norm2 = torch.nn.LayerNorm(c, eps=1e-6)

        class A(torch.nn.Module):
            pass
        self.attn = A()
        self.attn.attn = TorchWindowMSA(c, num_heads, ws)
        hidden = c * mlp_ratio

        class F(torch.nn.Module):
            pass
        self.ffn = F()
        self.ffn.layers = torch.nn.Sequential(
            torch.nn.Conv2d(c, hidden, 1), torch.nn.BatchNorm2d(hidden),
            torch.nn.GELU(),
            torch.nn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden),
            torch.nn.BatchNorm2d(hidden), torch.nn.GELU(),
            torch.nn.Conv2d(hidden, c, 1), torch.nn.BatchNorm2d(c),
            torch.nn.GELU())

    def _windows(self, x):                    # [B, H, W, C] -> windows
        b, h, w, c = x.shape
        pt, pb, pl, pr = center_pad_shape(h, w, self.ws, self.ws)
        xp = torch.nn.functional.pad(x.permute(0, 3, 1, 2),
                                     (pl, pr, pt, pb)).permute(0, 2, 3, 1)
        hp, wp = h + pt + pb, w + pl + pr
        xw = xp.reshape(b, hp // self.ws, self.ws, wp // self.ws, self.ws,
                        c).permute(0, 1, 3, 2, 4, 5)
        return xw.reshape(-1, self.ws * self.ws, c), (hp, wp, pt, pl)

    def _reverse(self, wins, b, h, w, geom):
        hp, wp, pt, pl = geom
        c = wins.shape[-1]
        x = wins.reshape(b, hp // self.ws, wp // self.ws, self.ws, self.ws,
                         c).permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        return x[:, pt:pt + h, pl:pl + w]

    def forward(self, x):                     # [B, H, W, C] NHWC
        b, h, w, c = x.shape
        wins, geom = self._windows(self.norm1(x))
        a = self._reverse(self.attn.attn(wins), b, h, w, geom)
        x = x + a
        f = self.norm2(x).permute(0, 3, 1, 2)
        f = self.ffn.layers(f).permute(0, 2, 3, 1)
        return x + f


def test_hrformer_block_converted_parity():
    torch.manual_seed(0)
    c, heads, ws = 16, 2, 7
    tb = TorchBlock(c, heads, ws).eval()
    # non-trivial BN running stats to exercise batch_stats mapping
    with torch.no_grad():
        for m in tb.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    # prefix the keys like a real checkpoint ('backbone.stage2.0...')
    sd = {'blk.' + k: v.detach().numpy()
          for k, v in tb.state_dict().items()}
    cv = Converter()
    _convert_hrformer_block(cv, sd, 'blk', ())
    _convert_crossffn(cv, sd, 'blk.ffn', ('ffn',))
    variables = _unflatten(cv)

    blk = HRFormerBlock(num_heads=heads, window_size=ws)
    x = np.random.default_rng(1).normal(0, 1, (2, 10, 13, c)).astype(
        np.float32)
    init = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    # converted tree must cover the initialized tree exactly
    from hrfuser_tpu.utils.pth_convert import verify_against
    assert verify_against(init, variables) == []

    got = np.asarray(blk.apply(variables, jnp.asarray(x), train=False))
    want = tb(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


class TorchWindowMCA(torch.nn.Module):
    """Split-projection window cross-attention
    (`hrfuser_hrformer_based.py:21-151` semantics)."""

    def __init__(self, c, num_heads, ws):
        super().__init__()
        self.num_heads = num_heads
        self.ws = ws
        self.q_proj = torch.nn.Linear(c, c)
        self.k_proj = torch.nn.Linear(c, c)
        self.v_proj = torch.nn.Linear(c, c)
        self.out_proj = torch.nn.Linear(c, c)
        self.relative_position_bias_table = torch.nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, num_heads) * 0.1)

    def forward(self, xw, zw):                # [B_, N, C] windows
        b, n, c = xw.shape
        h = self.num_heads
        hd = c // h
        q = self.q_proj(xw).reshape(b, n, h, hd).permute(0, 2, 1, 3)
        k = self.k_proj(zw).reshape(b, n, h, hd).permute(0, 2, 1, 3)
        v = self.v_proj(zw).reshape(b, n, h, hd).permute(0, 2, 1, 3)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        idx = torch.from_numpy(
            np.asarray(relative_position_index(self.ws, self.ws)))
        bias = self.relative_position_bias_table[idx.reshape(-1)].reshape(
            n, n, h).permute(2, 0, 1)
        attn = torch.softmax(attn + bias[None], dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.out_proj(out)


class TorchFusionBlock(TorchBlock):
    """HRFuserFusionBlock with the reference's parameter names and the
    exact residual semantics (`hrfuser_hrformer_based.py:250-326`):
    x_tmp frozen, x += z_k + MWCA_k(LN1_k(x_tmp), LN2_k(z_k)); + FFN."""

    def __init__(self, c, num_heads, ws, num_mod, mlp_ratio=4):
        super().__init__(c, num_heads, ws, mlp_ratio)
        del self.norm1, self.norm2
        self.norm1 = torch.nn.ModuleList(
            [torch.nn.LayerNorm(c, eps=1e-6) for _ in range(num_mod)])
        self.norm2 = torch.nn.ModuleList(
            [torch.nn.LayerNorm(c, eps=1e-6) for _ in range(num_mod)])
        self.norm3 = torch.nn.LayerNorm(c, eps=1e-6)

        class A(torch.nn.Module):
            pass
        self.attn = torch.nn.ModuleList()
        for _ in range(num_mod):
            a = A()
            a.attn = TorchWindowMCA(c, num_heads, ws)
            self.attn.append(a)

    def forward(self, x, mods):
        b, h, w, c = x.shape
        x_tmp = x
        for k, z in enumerate(mods):
            qw, geom = self._windows(self.norm1[k](x_tmp))
            kw, _ = self._windows(self.norm2[k](z))
            a = self._reverse(self.attn[k].attn(qw, kw), b, h, w, geom)
            x = x + z + a
        f = self.norm3(x).permute(0, 3, 1, 2)
        return x + self.ffn.layers(f).permute(0, 2, 3, 1)


def test_fusion_block_converted_parity():
    from hrfuser_tpu.layers import HRFuserFusionBlock
    from hrfuser_tpu.utils.pth_convert import (_convert_fusion_block,
                                               verify_against)

    torch.manual_seed(2)
    c, heads, ws, nm = 16, 2, 7, 2
    tb = TorchFusionBlock(c, heads, ws, nm).eval()
    with torch.no_grad():
        for m in tb.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    sd = {'fus.' + k: v.detach().numpy()
          for k, v in tb.state_dict().items()}
    cv = Converter()
    _convert_fusion_block(cv, sd, 'fus', (), nm)
    variables = _unflatten(cv)

    blk = HRFuserFusionBlock(num_heads=heads, num_modalities=nm,
                             window_size=ws)
    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (2, 10, 13, c)).astype(np.float32)
    mods = [rng.normal(0, 1, (2, 10, 13, c)).astype(np.float32)
            for _ in range(nm)]
    init = blk.init(jax.random.PRNGKey(0), jnp.asarray(x),
                    [jnp.asarray(m) for m in mods], train=False)
    assert verify_against(init, variables) == []

    got = np.asarray(blk.apply(variables, jnp.asarray(x),
                               [jnp.asarray(m) for m in mods], train=False))
    want = tb(torch.from_numpy(x),
              [torch.from_numpy(m) for m in mods]).detach().numpy()
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)
