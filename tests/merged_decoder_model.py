"""Optimum-merged-style encoder-decoder test model (torch -> ONNX).

Mimics what `optimum-cli export onnx` produces for whisper/TrOCR-style
models with --monolith=False merged decoders: a single decoder ONNX with
`use_cache_branch`, growing `past_key_values.N.decoder.*` self-attention
caches, and `past_key_values.N.encoder.*` cross-attention caches computed
on the first call only (via a real ONNX `If`), returning EMPTY dummy
encoder presents on later calls (rten generator.rs:891-915 tolerates and
ignores those).

Must live in a real source file: torch.jit.script needs inspectable source.
"""

import torch
import torch.nn as nn
from typing import Tuple


class MergedDecoderLayer(nn.Module):
    def __init__(self, E: int, H: int):
        super().__init__()
        self.E = E
        self.H = H
        self.D = E // H
        self.sq = nn.Linear(E, E)
        self.sk = nn.Linear(E, E)
        self.sv = nn.Linear(E, E)
        self.cq = nn.Linear(E, E)
        self.ck = nn.Linear(E, E)
        self.cv = nn.Linear(E, E)
        self.ff = nn.Linear(E, E)

    def _heads(self, x: torch.Tensor) -> torch.Tensor:
        B, T, _ = x.shape
        return x.reshape(B, T, self.H, self.D).transpose(1, 2)

    def forward(
        self,
        x: torch.Tensor,
        enc: torch.Tensor,
        use_cache_branch: torch.Tensor,
        past_dec_k: torch.Tensor,
        past_dec_v: torch.Tensor,
        past_enc_k: torch.Tensor,
        past_enc_v: torch.Tensor,
    ) -> Tuple[torch.Tensor, torch.Tensor, torch.Tensor, torch.Tensor, torch.Tensor]:
        B, T, _ = x.shape
        q = self._heads(self.sq(x))
        k = torch.cat([past_dec_k, self._heads(self.sk(x))], dim=2)
        v = torch.cat([past_dec_v, self._heads(self.sv(x))], dim=2)
        Tk = k.shape[2]
        # Causal mask anchored at cache end.
        qpos = torch.arange(Tk - T, Tk, device=x.device).unsqueeze(1)
        kpos = torch.arange(Tk, device=x.device).unsqueeze(0)
        causal = (kpos <= qpos).to(x.dtype)
        scores = q @ k.transpose(-1, -2) / float(self.D) ** 0.5
        scores = scores + (1.0 - causal) * -1e9
        attn = (torch.softmax(scores, -1) @ v).transpose(1, 2).reshape(B, T, self.E)
        x = x + attn

        if bool(use_cache_branch):
            ek = past_enc_k
            ev = past_enc_v
            # Dummy empty presents on cache runs (Optimum convention).
            ek_out = ek[:, :, :0]
            ev_out = ev[:, :, :0]
        else:
            ek = self._heads(self.ck(enc))
            ev = self._heads(self.cv(enc))
            ek_out = ek
            ev_out = ev
        cq = self._heads(self.cq(x))
        cattn = torch.softmax(cq @ ek.transpose(-1, -2) / float(self.D) ** 0.5, -1) @ ev
        cattn = cattn.transpose(1, 2).reshape(B, T, self.E)
        x = x + cattn + torch.relu(self.ff(x))
        return x, k, v, ek_out, ev_out


class MergedDecoder(nn.Module):
    """Two-layer merged decoder with Optimum IO conventions."""

    def __init__(self, vocab: int = 96, E: int = 32, H: int = 4, layers: int = 2):
        super().__init__()
        self.emb = nn.Embedding(vocab, E)
        self.pos = nn.Embedding(128, E)
        self.layers = nn.ModuleList([MergedDecoderLayer(E, H) for _ in range(layers)])
        self.out = nn.Linear(E, vocab)

    def forward(
        self,
        input_ids: torch.Tensor,
        encoder_hidden_states: torch.Tensor,
        use_cache_branch: torch.Tensor,
        past_dec_k0: torch.Tensor,
        past_dec_v0: torch.Tensor,
        past_enc_k0: torch.Tensor,
        past_enc_v0: torch.Tensor,
        past_dec_k1: torch.Tensor,
        past_dec_v1: torch.Tensor,
        past_enc_k1: torch.Tensor,
        past_enc_v1: torch.Tensor,
    ) -> Tuple[
        torch.Tensor, torch.Tensor, torch.Tensor, torch.Tensor, torch.Tensor,
        torch.Tensor, torch.Tensor, torch.Tensor, torch.Tensor,
    ]:
        T = input_ids.shape[1]
        t0 = past_dec_k0.shape[2]
        pos = torch.arange(t0, t0 + T, device=input_ids.device)
        x = self.emb(input_ids) + self.pos(pos).unsqueeze(0)
        x, dk0, dv0, ek0, ev0 = self.layers[0](
            x, encoder_hidden_states, use_cache_branch,
            past_dec_k0, past_dec_v0, past_enc_k0, past_enc_v0,
        )
        x, dk1, dv1, ek1, ev1 = self.layers[1](
            x, encoder_hidden_states, use_cache_branch,
            past_dec_k1, past_dec_v1, past_enc_k1, past_enc_v1,
        )
        return self.out(x), dk0, dv0, ek0, ev0, dk1, dv1, ek1, ev1


def export_merged_decoder(path: str, vocab: int = 96, E: int = 32, H: int = 4):
    """Script + export with Optimum names; returns the eager module."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from onnx_export_util import export_onnx

    torch.manual_seed(0)
    m = MergedDecoder(vocab=vocab, E=E, H=H).eval()
    sm = torch.jit.script(m)
    D = E // H
    ids = torch.zeros(1, 3, dtype=torch.int64)
    enc = torch.randn(1, 5, E)
    flag = torch.tensor(False)
    zdec = torch.zeros(1, H, 0, D)
    zenc = torch.zeros(1, H, 0, D)
    in_names = ["input_ids", "encoder_hidden_states", "use_cache_branch"]
    out_names = ["logits"]
    for i in range(2):
        in_names += [
            f"past_key_values.{i}.decoder.key", f"past_key_values.{i}.decoder.value",
            f"past_key_values.{i}.encoder.key", f"past_key_values.{i}.encoder.value",
        ]
        out_names += [
            f"present.{i}.decoder.key", f"present.{i}.decoder.value",
            f"present.{i}.encoder.key", f"present.{i}.encoder.value",
        ]
    dyn = {"input_ids": {0: "b", 1: "t"},
           "encoder_hidden_states": {0: "b", 1: "s"}}
    for n in in_names[3:]:
        dyn[n] = {0: "b", 2: "p"}
    for n in out_names[1:]:
        dyn[n] = {0: "b", 2: "p"}
    args = (ids, enc, flag, zdec, zdec, zenc, zenc, zdec, zdec, zenc, zenc)
    export_onnx(sm, args, path, in_names, out_names, dynamic_axes=dyn)
    return m
