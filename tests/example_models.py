"""Tiny torch models backing the example demos (offline stand-ins for the
reference's downloadable checkpoints; same IO conventions)."""

import os
import sys

import torch
import torch.nn as nn

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from onnx_export_util import export_onnx  # noqa: E402


class _EncBlock(nn.Module):
    def __init__(self, E, heads):
        super().__init__()
        self.H, self.D = heads, E // heads
        self.qkv = nn.Linear(E, 3 * E)
        self.proj = nn.Linear(E, E)
        self.n1 = nn.LayerNorm(E)
        self.n2 = nn.LayerNorm(E)
        self.ff = nn.Sequential(nn.Linear(E, 2 * E), nn.GELU(), nn.Linear(2 * E, E))

    def forward(self, x, add_mask):
        B, T, E = x.shape
        h = self.n1(x)
        q, k, v = self.qkv(h).chunk(3, -1)

        def heads(t):
            return t.reshape(B, T, self.H, self.D).transpose(1, 2)

        s = heads(q) @ heads(k).transpose(-1, -2) / self.D ** 0.5 + add_mask
        a = (torch.softmax(s, -1) @ heads(v)).transpose(1, 2).reshape(B, T, E)
        x = x + self.proj(a)
        return x + self.ff(self.n2(x))


class TinyEncoder(nn.Module):
    """Mini BERT-ish encoder trunk (hand-rolled: torch's TransformerEncoder
    with padding masks doesn't export to ONNX)."""

    def __init__(self, vocab=128, E=32, layers=2, heads=4):
        super().__init__()
        self.emb = nn.Embedding(vocab, E)
        self.blocks = nn.ModuleList([_EncBlock(E, heads) for _ in range(layers)])

    def forward(self, input_ids, attention_mask):
        x = self.emb(input_ids)
        add_mask = (1.0 - attention_mask.float()) * -1e9
        add_mask = add_mask[:, None, None, :]
        for blk in self.blocks:
            x = blk(x, add_mask)
        return x


class QAModel(nn.Module):
    def __init__(self):
        super().__init__()
        self.trunk = TinyEncoder()
        self.head = nn.Linear(32, 2)

    def forward(self, input_ids, attention_mask):
        h = self.trunk(input_ids, attention_mask)
        logits = self.head(h)
        return logits[..., 0], logits[..., 1]


class EmbedModel(nn.Module):
    """Sentence-embedding model: mean-pooled hidden states, normalized."""

    def __init__(self):
        super().__init__()
        self.trunk = TinyEncoder()

    def forward(self, input_ids, attention_mask):
        h = self.trunk(input_ids, attention_mask)
        m = attention_mask.unsqueeze(-1).float()
        emb = (h * m).sum(1) / m.sum(1).clamp(min=1)
        return emb / emb.norm(dim=-1, keepdim=True).clamp(min=1e-9)


class SegModel(nn.Module):
    """Tiny semantic-segmentation net (deeplab stand-in): conv -> classes."""

    def __init__(self, classes=3):
        super().__init__()
        self.c1 = nn.Conv2d(3, 8, 3, padding=1)
        self.c2 = nn.Conv2d(8, 16, 3, padding=1, stride=2)
        self.c3 = nn.Conv2d(16, classes, 1)
        self.up = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False)

    def forward(self, x):
        h = torch.relu(self.c1(x))
        h = torch.relu(self.c2(h))
        return self.up(self.c3(h))


class DepthModel(nn.Module):
    """Monocular depth stand-in (depth_anything analog)."""

    def __init__(self):
        super().__init__()
        self.c1 = nn.Conv2d(3, 8, 3, padding=1, stride=2)
        self.c2 = nn.Conv2d(8, 8, 3, padding=1)
        self.c3 = nn.Conv2d(8, 1, 1)
        self.up = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False)

    def forward(self, x):
        h = torch.relu(self.c1(x))
        h = torch.relu(self.c2(h))
        return torch.sigmoid(self.up(self.c3(h)))[:, 0]


class CTCModel(nn.Module):
    """wav2vec2-ish CTC acoustic model: conv frontend + classifier."""

    def __init__(self, classes=30):
        super().__init__()
        self.c1 = nn.Conv1d(1, 16, 11, stride=5, padding=5)
        self.c2 = nn.Conv1d(16, 16, 5, stride=4, padding=2)
        self.head = nn.Conv1d(16, classes, 1)

    def forward(self, audio):
        h = torch.relu(self.c1(audio.unsqueeze(1)))
        h = torch.relu(self.c2(h))
        return torch.log_softmax(self.head(h).transpose(1, 2), -1)  # [B,T,C]


def _export(module, args, path, in_names, out_names, dyn=None):
    torch.manual_seed(0)
    module = module.eval()
    export_onnx(module, args, path, in_names, out_names, dynamic_axes=dyn)
    return module


def export_qa_model(path):
    ids = torch.zeros(1, 64, dtype=torch.int64)
    mask = torch.ones(1, 64, dtype=torch.int64)
    return _export(QAModel(), (ids, mask), path,
                   ["input_ids", "attention_mask"],
                   ["start_logits", "end_logits"],
                   {"input_ids": {0: "b", 1: "t"},
                    "attention_mask": {0: "b", 1: "t"}})


def export_embed_model(path):
    ids = torch.zeros(2, 16, dtype=torch.int64)
    mask = torch.ones(2, 16, dtype=torch.int64)
    return _export(EmbedModel(), (ids, mask), path,
                   ["input_ids", "attention_mask"], ["embeddings"],
                   {"input_ids": {0: "b", 1: "t"},
                    "attention_mask": {0: "b", 1: "t"}})


def export_seg_model(path):
    x = torch.randn(1, 3, 32, 32)
    return _export(SegModel(), (x,), path, ["image"], ["logits"])


def export_depth_model(path):
    x = torch.randn(1, 3, 32, 32)
    return _export(DepthModel(), (x,), path, ["image"], ["depth"])


def export_ctc_model(path):
    audio = torch.randn(1, 4000)
    return _export(CTCModel(), (audio,), path, ["audio"], ["log_probs"])


class OCREncoder(nn.Module):
    """Tiny vision encoder: image -> [B, S, E] hidden states."""

    def __init__(self, E=32):
        super().__init__()
        self.c1 = nn.Conv2d(1, 8, 3, stride=2, padding=1)
        self.c2 = nn.Conv2d(8, E, 3, stride=2, padding=1)
        self.E = E

    def forward(self, image):
        h = torch.relu(self.c1(image))
        h = torch.relu(self.c2(h))          # [B, E, H/4, W/4]
        B, E, H, W = h.shape
        return h.mean(2).transpose(1, 2)    # [B, W, E] column features


def export_ocr_models(enc_path, dec_path):
    """TrOCR-style pair: vision encoder + merged text decoder."""
    from merged_decoder_model import export_merged_decoder

    torch.manual_seed(1)
    enc = OCREncoder().eval()
    img = torch.randn(1, 1, 16, 64)
    export_onnx(enc, (img,), enc_path, ["image"], ["encoder_hidden_states"],
                dynamic_axes={"image": {0: "b"}})
    dec = export_merged_decoder(dec_path, vocab=64, E=32, H=4)
    return enc, dec


class TinyVocoder(nn.Module):
    """Piper/HiFiGAN-class mel->waveform vocoder: ConvTranspose1d upsample
    stack with residual conv blocks and a tanh head (the graph class the
    reference's piper TTS demo exercises, rten-examples/src/piper.rs)."""

    def __init__(self, n_mels=20, ch=32, rates=(4, 4)):
        super().__init__()
        self.pre = nn.Conv1d(n_mels, ch, 7, padding=3)
        ups, res = [], []
        c = ch
        for r in rates:
            ups.append(nn.ConvTranspose1d(c, c // 2, 2 * r, stride=r,
                                          padding=r // 2))
            c //= 2
            res.append(nn.Sequential(
                nn.Conv1d(c, c, 3, padding=1),
                nn.LeakyReLU(0.1),
                nn.Conv1d(c, c, 3, padding=2, dilation=2),
            ))
        self.ups = nn.ModuleList(ups)
        self.res = nn.ModuleList(res)
        self.post = nn.Conv1d(c, 1, 7, padding=3)
        self.upsample = 1
        for r in rates:
            self.upsample *= r

    def forward(self, mel):
        h = self.pre(mel)
        for up, res in zip(self.ups, self.res):
            h = up(torch.nn.functional.leaky_relu(h, 0.1))
            h = h + res(h)
        return torch.tanh(self.post(h))  # [B, 1, T * upsample]


def export_vocoder_model(path):
    mel = torch.randn(1, 20, 32)
    return _export(TinyVocoder(), (mel,), path, ["mel"], ["waveform"],
                   {"mel": {0: "b", 2: "t"}})


class TinyVad(nn.Module):
    """Silero-class streaming voice-activity model: small conv feature
    extractor + LSTM whose (h, c) state is an explicit input/output so the
    caller streams fixed-size chunks (rten-examples/src/silero.rs IO
    convention)."""

    def __init__(self, ch=16, hidden=32):
        super().__init__()
        self.conv1 = nn.Conv1d(1, ch, 5, stride=4, padding=2)
        self.conv2 = nn.Conv1d(ch, 2 * ch, 3, stride=2, padding=1)
        self.rnn = nn.LSTM(2 * ch, hidden, batch_first=True)
        self.head = nn.Linear(hidden, 1)

    def forward(self, audio, h, c):
        f = torch.relu(self.conv1(audio[:, None]))
        f = torch.relu(self.conv2(f)).transpose(1, 2)  # [B, T', 2ch]
        out, (h2, c2) = self.rnn(f, (h, c))
        prob = torch.sigmoid(self.head(out[:, -1]))[:, 0]
        return prob, h2, c2


def export_vad_model(path, hidden=32):
    audio = torch.randn(1, 512)
    h = torch.zeros(1, 1, hidden)
    c = torch.zeros(1, 1, hidden)
    return _export(TinyVad(hidden=hidden), (audio, h, c), path,
                   ["audio", "h", "c"], ["prob", "hn", "cn"],
                   {"audio": {0: "b"}, "h": {1: "b"}, "c": {1: "b"}})


class ClipImageEncoder(nn.Module):
    def __init__(self, E=32):
        super().__init__()
        self.c1 = nn.Conv2d(3, 16, 3, stride=2, padding=1)
        self.c2 = nn.Conv2d(16, 32, 3, stride=2, padding=1)
        self.proj = nn.Linear(32, E)

    def forward(self, image):
        h = torch.relu(self.c1(image))
        h = torch.relu(self.c2(h))
        emb = self.proj(h.mean((2, 3)))
        return emb / emb.norm(dim=-1, keepdim=True)


class ClipTextEncoder(nn.Module):
    def __init__(self, E=32):
        super().__init__()
        self.trunk = TinyEncoder(E=E)
        self.proj = nn.Linear(E, E)

    def forward(self, input_ids, attention_mask):
        h = self.trunk(input_ids, attention_mask)
        m = attention_mask[..., None].float()
        pooled = (h * m).sum(1) / m.sum(1).clamp(min=1)
        emb = self.proj(pooled)
        return emb / emb.norm(dim=-1, keepdim=True)


def export_clip_models(img_path, txt_path, E=32):
    """CLIP-style dual encoder (rten-examples/src/clip.rs zero-shot
    classification: joint image/text embedding space)."""
    torch.manual_seed(2)
    img_m = ClipImageEncoder(E).eval()
    txt_m = ClipTextEncoder(E).eval()
    export_onnx(img_m, (torch.randn(1, 3, 32, 32),), img_path,
                ["image"], ["image_embeds"], dynamic_axes={"image": {0: "b"}})
    ids = torch.zeros(2, 12, dtype=torch.int64)
    mask = torch.ones(2, 12, dtype=torch.int64)
    export_onnx(txt_m, (ids, mask), txt_path,
                ["input_ids", "attention_mask"], ["text_embeds"],
                dynamic_axes={"input_ids": {0: "b", 1: "t"},
                              "attention_mask": {0: "b", 1: "t"}})
    return img_m, txt_m


class SamPromptDecoder(nn.Module):
    """Prompted mask decoder (segment-anything analog): image embedding +
    point prompts -> mask logits + IoU score. Point coords are embedded
    with a random Fourier positional map (SAM's PositionEmbeddingRandom)."""

    def __init__(self, E=32, grid=8):
        super().__init__()
        self.grid = grid
        self.register_buffer("pos_mat", torch.randn(2, E // 2))
        self.label_emb = nn.Embedding(2, E)
        self.q1 = nn.Linear(E, E)
        self.k1 = nn.Linear(E, E)
        self.v1 = nn.Linear(E, E)
        self.mask_head = nn.Linear(E, E)
        self.iou_head = nn.Linear(E, 1)

    def forward(self, image_embed, points, labels):
        # image_embed: [B, E, g, g]; points: [B, P, 2] in [0,1]; labels [B, P]
        B, E, g, _ = image_embed.shape
        tokens = (
            torch.sin(2.0 * torch.pi * points @ self.pos_mat)
            .repeat_interleave(2, dim=-1)[..., :E]
            + self.label_emb(labels)
        )  # [B, P, E]
        img = image_embed.reshape(B, E, g * g).transpose(1, 2)  # [B, g*g, E]
        q = self.q1(tokens)
        att = torch.softmax(q @ self.k1(img).transpose(-1, -2) / E ** 0.5, -1)
        tokens = tokens + att @ self.v1(img)
        mask_tok = self.mask_head(tokens.mean(1))  # [B, E]
        mask = (img @ mask_tok[..., None]).reshape(B, 1, g, g)
        mask = torch.nn.functional.interpolate(
            mask, scale_factor=4, mode="bilinear", align_corners=False
        )
        return mask, self.iou_head(mask_tok)


class SamImageEncoder(nn.Module):
    def __init__(self, E=32):
        super().__init__()
        self.c1 = nn.Conv2d(3, 16, 3, stride=2, padding=1)
        self.c2 = nn.Conv2d(16, E, 3, stride=2, padding=1)

    def forward(self, image):
        return self.c2(torch.relu(self.c1(image)))


def export_sam_models(enc_path, dec_path, E=32):
    """Segment-anything style two-model pipeline
    (rten-examples/src/segment_anything.rs): heavy image encoder run once,
    light prompt decoder re-run per point prompt."""
    torch.manual_seed(4)
    enc = SamImageEncoder(E).eval()
    dec = SamPromptDecoder(E).eval()
    export_onnx(enc, (torch.randn(1, 3, 32, 32),), enc_path,
                ["image"], ["image_embed"], dynamic_axes={"image": {0: "b"}})
    embed = torch.randn(1, E, 8, 8)
    pts = torch.rand(1, 2, 2)
    lbl = torch.ones(1, 2, dtype=torch.int64)
    export_onnx(dec, (embed, pts, lbl), dec_path,
                ["image_embed", "points", "labels"], ["mask", "iou"],
                dynamic_axes={"points": {1: "p"}, "labels": {1: "p"}})
    return enc, dec


class RmbgModel(nn.Module):
    """Background-removal matte net (BRIA RMBG analog): conv encoder ->
    decoder with skip connection -> sigmoid alpha matte at input size."""

    def __init__(self):
        super().__init__()
        self.e1 = nn.Conv2d(3, 16, 3, stride=2, padding=1)
        self.e2 = nn.Conv2d(16, 32, 3, stride=2, padding=1)
        self.d1 = nn.ConvTranspose2d(32, 16, 2, stride=2)
        self.d2 = nn.ConvTranspose2d(16, 8, 2, stride=2)
        self.out = nn.Conv2d(8, 1, 3, padding=1)

    def forward(self, image):
        s1 = torch.relu(self.e1(image))
        h = torch.relu(self.e2(s1))
        h = torch.relu(self.d1(h)) + s1
        h = torch.relu(self.d2(h))
        return torch.sigmoid(self.out(h))


def export_rmbg_model(path):
    """Background removal (rten-examples/src/rmbg.rs): image -> alpha
    matte, composited to RGBA by the caller."""
    torch.manual_seed(5)
    m = RmbgModel().eval()
    export_onnx(m, (torch.randn(1, 3, 32, 32),), path, ["image"], ["alpha"],
                dynamic_axes={"image": {0: "b", 2: "h", 3: "w"}})
    return m


class ByteEncoder(nn.Module):
    """Byte-level text encoder (ByT5 analog: vocab = 256 bytes + specials)."""

    def __init__(self, E=32, layers=2, heads=4):
        super().__init__()
        self.trunk = TinyEncoder(vocab=259 + 3, E=E, layers=layers, heads=heads)

    def forward(self, input_ids, attention_mask):
        return self.trunk(input_ids, attention_mask)


def export_g2p_models(enc_path, dec_path, E=32):
    """ByT5-style g2p pair (rten-examples/src/byt5_g2p.rs): byte-level
    encoder + merged decoder emitting phoneme bytes."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from merged_decoder_model import export_merged_decoder

    torch.manual_seed(6)
    enc = ByteEncoder(E).eval()
    ids = torch.zeros(1, 8, dtype=torch.int64)
    mask = torch.ones(1, 8, dtype=torch.int64)
    export_onnx(enc, (ids, mask), enc_path,
                ["input_ids", "attention_mask"], ["last_hidden_state"],
                dynamic_axes={"input_ids": {0: "b", 1: "t"},
                              "attention_mask": {0: "b", 1: "t"}})
    dec = export_merged_decoder(dec_path, vocab=259 + 3, E=E)
    return enc, dec


class MLMModel(nn.Module):
    """Masked-LM (fill-mask) model: encoder trunk + vocab-projection head
    (ModernBERT/BERT masked-word-prediction class)."""

    def __init__(self, vocab=128, E=32):
        super().__init__()
        self.trunk = TinyEncoder(vocab=vocab, E=E)
        self.head = nn.Linear(E, vocab)

    def forward(self, input_ids, attention_mask):
        return self.head(self.trunk(input_ids, attention_mask))


def export_mlm_model(path, vocab=128):
    torch.manual_seed(7)
    m = MLMModel(vocab=vocab).eval()
    ids = torch.zeros(1, 8, dtype=torch.int64)
    mask = torch.ones(1, 8, dtype=torch.int64)
    _export(m, (ids, mask), path, ["input_ids", "attention_mask"],
            ["logits"],
            dyn={"input_ids": {0: "b", 1: "t"},
                 "attention_mask": {0: "b", 1: "t"}})
    return m


class PatchEncoder(nn.Module):
    """ViT-style image encoder: non-overlapping patch embed (a strided
    conv) + one transformer block -> [B, patches, E] hidden states
    (DistilViT image-captioning class)."""

    def __init__(self, E=32, patch=8, heads=4):
        super().__init__()
        self.proj = nn.Conv2d(3, E, patch, stride=patch)
        self.blk = _EncBlock(E, heads)

    def forward(self, image):
        h = self.proj(image)                 # [B, E, h, w]
        x = h.flatten(2).transpose(1, 2)     # [B, h*w, E]
        return self.blk(x, torch.zeros(1, 1, 1, 1))


def export_caption_models(enc_path, dec_path, E=32):
    """DistilViT-style captioning pair: ViT patch encoder + merged text
    decoder (same Optimum merged-decoder conventions as OCR/g2p)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from merged_decoder_model import export_merged_decoder

    torch.manual_seed(8)
    enc = PatchEncoder(E).eval()
    img = torch.randn(1, 3, 32, 32)
    export_onnx(enc, (img,), enc_path, ["image"], ["encoder_hidden_states"],
                dynamic_axes={"image": {0: "b"}})
    dec = export_merged_decoder(dec_path, vocab=64, E=E)
    return enc, dec
