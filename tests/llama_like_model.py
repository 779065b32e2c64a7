"""Llama-architecture decoder (RMSNorm + rotary + GQA + SwiGLU) in torch,
exportable to ONNX with Optimum-style KV-cache IO.

This is the round-2 'real GQA+rotary LLM through the generic path' model
(VERDICT next-round item 2; reference counterpart:
rten-examples/src/qwen2_chat.rs + rten-generate/src/generator.rs:267-322).
Architecture matches Llama/Qwen2: grouped KV heads, rotary on q/k,
RMSNorm pre-norms, gated SiLU MLP, weight-tied-free lm_head.
"""

from typing import List, Tuple

import torch
import torch.nn as nn


class RMSNorm(nn.Module):
    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.pow(2).mean(-1, keepdim=True)
        return self.weight * (x * torch.rsqrt(var + self.eps))


def _rotate_half(x):
    half = x.shape[-1] // 2
    return torch.cat([-x[..., half:], x[..., :half]], dim=-1)


class LlamaLikeLayer(nn.Module):
    def __init__(self, E: int, Hq: int, Hkv: int, ffn: int,
                 qkv_bias: bool = False):
        super().__init__()
        self.E, self.Hq, self.Hkv = E, Hq, Hkv
        self.D = E // Hq
        self.q_proj = nn.Linear(E, Hq * self.D, bias=qkv_bias)
        self.k_proj = nn.Linear(E, Hkv * self.D, bias=qkv_bias)
        self.v_proj = nn.Linear(E, Hkv * self.D, bias=qkv_bias)
        self.o_proj = nn.Linear(Hq * self.D, E, bias=False)
        self.gate_proj = nn.Linear(E, ffn, bias=False)
        self.up_proj = nn.Linear(E, ffn, bias=False)
        self.down_proj = nn.Linear(ffn, E, bias=False)
        self.input_norm = RMSNorm(E)
        self.post_norm = RMSNorm(E)

    def forward(self, x, cos, sin, add_mask, past_k, past_v):
        B, T, _ = x.shape
        h = self.input_norm(x)
        q = self.q_proj(h).reshape(B, T, self.Hq, self.D).transpose(1, 2)
        k = self.k_proj(h).reshape(B, T, self.Hkv, self.D).transpose(1, 2)
        v = self.v_proj(h).reshape(B, T, self.Hkv, self.D).transpose(1, 2)
        # rotary: cos/sin [B, T, D] broadcast over heads
        q = q * cos.unsqueeze(1) + _rotate_half(q) * sin.unsqueeze(1)
        k = k * cos.unsqueeze(1) + _rotate_half(k) * sin.unsqueeze(1)
        k = torch.cat([past_k, k], dim=2)
        v = torch.cat([past_v, v], dim=2)
        group = self.Hq // self.Hkv
        kx = k.repeat_interleave(group, dim=1)
        vx = v.repeat_interleave(group, dim=1)
        s = q @ kx.transpose(-1, -2) / float(self.D) ** 0.5
        s = s + add_mask  # [B, 1, T, Tk] additive (causal+padding)
        attn = (torch.softmax(s, -1) @ vx).transpose(1, 2).reshape(B, T, -1)
        x = x + self.o_proj(attn)
        h2 = self.post_norm(x)
        x = x + self.down_proj(
            torch.nn.functional.silu(self.gate_proj(h2)) * self.up_proj(h2)
        )
        return x, k, v


class LlamaLike(nn.Module):
    def __init__(self, vocab: int = 256, E: int = 64, Hq: int = 4,
                 Hkv: int = 2, ffn: int = 128, layers: int = 2,
                 max_pos: int = 512, rope_theta: float = 10000.0,
                 qkv_bias: bool = False):
        super().__init__()
        self.cfg = dict(vocab=vocab, E=E, Hq=Hq, Hkv=Hkv, ffn=ffn,
                        layers=layers, max_pos=max_pos)
        self.D = E // Hq
        self.embed_tokens = nn.Embedding(vocab, E)
        self.layers = nn.ModuleList(
            [LlamaLikeLayer(E, Hq, Hkv, ffn, qkv_bias) for _ in range(layers)]
        )
        self.norm = RMSNorm(E)
        self.lm_head = nn.Linear(E, vocab, bias=False)
        inv = 1.0 / (rope_theta ** (torch.arange(0, self.D, 2) / self.D))
        t = torch.arange(max_pos)
        freqs = torch.outer(t, inv)          # [max_pos, D/2]
        emb = torch.cat([freqs, freqs], -1)  # [max_pos, D]
        self.register_buffer("cos_table", emb.cos(), persistent=False)
        self.register_buffer("sin_table", emb.sin(), persistent=False)

    def forward(self, input_ids, attention_mask, position_ids,
                *past: torch.Tensor):
        B, T = input_ids.shape
        x = self.embed_tokens(input_ids)
        cos = self.cos_table[position_ids]   # [B, T, D]
        sin = self.sin_table[position_ids]
        # attention_mask [B, total]: 1 keep, 0 pad -> additive [B,1,1,total]
        add_mask = (1.0 - attention_mask.float()) * -1e9
        add_mask = add_mask.unsqueeze(1).unsqueeze(2)
        Tk = attention_mask.shape[1]
        # causal part anchored at KV end
        qpos = torch.arange(Tk - T, Tk).unsqueeze(1)
        kpos = torch.arange(Tk).unsqueeze(0)
        causal = torch.where(kpos <= qpos, 0.0, -1e9)
        add_mask = add_mask + causal.unsqueeze(0).unsqueeze(0)
        presents: List[torch.Tensor] = []
        for i, layer in enumerate(self.layers):
            x, pk, pv = layer(x, cos, sin, add_mask, past[2 * i], past[2 * i + 1])
            presents.append(pk)
            presents.append(pv)
        logits = self.lm_head(self.norm(x))
        return (logits, *presents)


def export_llama_like(path: str, **kw) -> LlamaLike:
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from onnx_export_util import export_onnx

    torch.manual_seed(0)
    m = LlamaLike(**kw).eval()
    L = len(m.layers)
    Hkv, D = m.layers[0].Hkv, m.D
    ids = torch.zeros(1, 3, dtype=torch.int64)
    mask = torch.ones(1, 3, dtype=torch.int64)
    pos = torch.arange(3).unsqueeze(0)
    past = [torch.zeros(1, Hkv, 0, D) for _ in range(2 * L)]
    in_names = ["input_ids", "attention_mask", "position_ids"]
    out_names = ["logits"]
    dyn = {"input_ids": {0: "b", 1: "t"}, "attention_mask": {0: "b", 1: "tk"},
           "position_ids": {0: "b", 1: "t"}}
    for i in range(L):
        for kind in ("key", "value"):
            in_names.append(f"past_key_values.{i}.{kind}")
            out_names.append(f"present.{i}.{kind}")
            dyn[f"past_key_values.{i}.{kind}"] = {0: "b", 2: "p"}
            dyn[f"present.{i}.{kind}"] = {0: "b", 2: "pp"}
    export_onnx(m, (ids, mask, pos, *past), path, in_names, out_names,
                dynamic_axes=dyn)
    return m


@torch.no_grad()
def torch_greedy(m: LlamaLike, prompt: List[int], n_steps: int) -> List[int]:
    L = len(m.layers)
    Hkv, D = m.layers[0].Hkv, m.D
    past = [torch.zeros(1, Hkv, 0, D) for _ in range(2 * L)]
    ids = torch.tensor([prompt], dtype=torch.int64)
    total = len(prompt)
    pos = torch.arange(total).unsqueeze(0)
    toks = []
    for _ in range(n_steps):
        mask = torch.ones(1, total, dtype=torch.int64)
        out = m(ids, mask, pos, *past)
        logits, past = out[0], list(out[1:])
        tok = int(torch.argmax(logits[0, -1]))
        toks.append(tok)
        ids = torch.tensor([[tok]], dtype=torch.int64)
        pos = torch.tensor([[total]])
        total += 1
    return toks
