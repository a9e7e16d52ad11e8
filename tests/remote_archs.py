"""Torch replicas of the trust_remote_code encoder architectures the
reference drives (GTE-v1.5 `NewModel`, nomic-embed `NomicBertModel`, jina-v2
`JinaBertModel`).

No network access exists here, so the real remote modeling code cannot be
fetched; these modules re-implement the published architectures with the real
checkpoints' state-dict key names, giving the JAX ports a local ground truth
for numerics + conversion-layout tests (same technique as the gemma-2/cohere
parity tests against HF classes)."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def rope_split_half(x, theta):
    # x: [B, S, H, Dh]; GPT-NeoX/llama-style split-half rotation over
    # absolute positions
    B, S, H, Dh = x.shape
    inv = 1.0 / (theta ** (torch.arange(0, Dh, 2).float() / Dh))
    ang = torch.arange(S).float()[:, None] * inv  # [S, Dh/2]
    cos, sin = ang.cos()[None, :, None, :], ang.sin()[None, :, None, :]
    x1, x2 = x[..., : Dh // 2], x[..., Dh // 2:]
    return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)


def sdpa(q, k, v, mask, bias=None):
    # q/k/v: [B, S, H, Dh]; mask: [B, S] (1 = attend); bias: [H, S, S]
    Dh = q.shape[-1]
    scores = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(Dh)
    if bias is not None:
        scores = scores + bias[None]
    scores = scores.masked_fill(~mask[:, None, None, :].bool(), -1e30)
    return torch.einsum("bhqk,bkhd->bqhd", scores.softmax(-1), v)


class _Embeddings(nn.Module):
    def __init__(self, vocab, hidden, type_vocab, with_ln=True):
        super().__init__()
        self.word_embeddings = nn.Embedding(vocab, hidden)
        if type_vocab:
            self.token_type_embeddings = nn.Embedding(type_vocab, hidden)
        if with_ln:
            self.LayerNorm = nn.LayerNorm(hidden, eps=1e-12)

    def forward(self, ids):
        x = self.word_embeddings(ids)
        if hasattr(self, "token_type_embeddings"):
            x = x + self.token_type_embeddings(torch.zeros_like(ids))
        if hasattr(self, "LayerNorm"):
            x = self.LayerNorm(x)
        return x


# --------------------------------------------------------------------------- #
# GTE v1.5 (Alibaba-NLP/gte-*-en-v1.5, model_type "new")
# --------------------------------------------------------------------------- #


class _GteLayer(nn.Module):
    def __init__(self, hidden, heads, inter):
        super().__init__()
        self.attention = nn.Module()
        self.attention.qkv_proj = nn.Linear(hidden, 3 * hidden, bias=True)
        self.attention.o_proj = nn.Linear(hidden, hidden, bias=True)
        self.attn_ln = nn.LayerNorm(hidden, eps=1e-12)
        self.mlp = nn.Module()
        self.mlp.up_gate_proj = nn.Linear(hidden, 2 * inter, bias=False)
        self.mlp.down_proj = nn.Linear(inter, hidden, bias=True)
        self.mlp_ln = nn.LayerNorm(hidden, eps=1e-12)
        self.heads, self.inter = heads, inter

    def forward(self, x, mask, theta):
        B, S, D = x.shape
        qkv = self.attention.qkv_proj(x).view(B, S, 3, self.heads, D // self.heads)
        q, k, v = qkv.unbind(2)
        q, k = rope_split_half(q, theta), rope_split_half(k, theta)
        a = self.attention.o_proj(sdpa(q, k, v, mask).reshape(B, S, D))
        x = self.attn_ln(x + a)
        ug = self.mlp.up_gate_proj(x)
        up, gate = ug[..., : self.inter], ug[..., self.inter:]
        h = self.mlp.down_proj(up * F.gelu(gate))
        return self.mlp_ln(x + h)


class GteReplica(nn.Module):
    def __init__(self, vocab=64, hidden=32, layers=2, heads=4, inter=48,
                 theta=160000.0, type_vocab=1):
        super().__init__()
        self.embeddings = _Embeddings(vocab, hidden, type_vocab)
        self.encoder = nn.Module()
        self.encoder.layer = nn.ModuleList(
            [_GteLayer(hidden, heads, inter) for _ in range(layers)]
        )
        self.theta = theta

    def forward(self, ids, mask):
        x = self.embeddings(ids)
        for lyr in self.encoder.layer:
            x = lyr(x, mask, self.theta)
        return x


# --------------------------------------------------------------------------- #
# nomic-embed (nomic-ai/nomic-embed-text-v1.5, model_type "nomic_bert")
# --------------------------------------------------------------------------- #


class _NomicLayer(nn.Module):
    def __init__(self, hidden, heads, inter):
        super().__init__()
        self.attn = nn.Module()
        self.attn.Wqkv = nn.Linear(hidden, 3 * hidden, bias=False)
        self.attn.out_proj = nn.Linear(hidden, hidden, bias=False)
        self.norm1 = nn.LayerNorm(hidden, eps=1e-12)
        self.mlp = nn.Module()
        self.mlp.fc11 = nn.Linear(hidden, inter, bias=False)  # up
        self.mlp.fc12 = nn.Linear(hidden, inter, bias=False)  # gate (silu)
        self.mlp.fc2 = nn.Linear(inter, hidden, bias=False)
        self.norm2 = nn.LayerNorm(hidden, eps=1e-12)
        self.heads = heads

    def forward(self, x, mask, theta):
        B, S, D = x.shape
        qkv = self.attn.Wqkv(x).view(B, S, 3, self.heads, D // self.heads)
        q, k, v = qkv.unbind(2)
        q, k = rope_split_half(q, theta), rope_split_half(k, theta)
        a = self.attn.out_proj(sdpa(q, k, v, mask).reshape(B, S, D))
        x = self.norm1(x + a)
        h = self.mlp.fc2(self.mlp.fc11(x) * F.silu(self.mlp.fc12(x)))
        return self.norm2(x + h)


class NomicReplica(nn.Module):
    def __init__(self, vocab=64, hidden=32, layers=2, heads=4, inter=48,
                 theta=1000.0, type_vocab=2):
        super().__init__()
        self.embeddings = _Embeddings(vocab, hidden, type_vocab, with_ln=False)
        self.emb_ln = nn.LayerNorm(hidden, eps=1e-12)
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList(
            [_NomicLayer(hidden, heads, inter) for _ in range(layers)]
        )
        self.theta = theta

    def forward(self, ids, mask):
        x = self.emb_ln(self.embeddings(ids))
        for lyr in self.encoder.layers:
            x = lyr(x, mask, self.theta)
        return x


# --------------------------------------------------------------------------- #
# jina-v2 (jinaai/jina-embeddings-v2-base-en, model_type "bert" + alibi+geglu)
# --------------------------------------------------------------------------- #


def alibi_slopes(h):
    def pow2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(h).is_integer():
        return torch.tensor(pow2(h))
    base = 2 ** math.floor(math.log2(h))
    return torch.tensor(pow2(base) + pow2(2 * base)[0::2][: h - base])


class _JinaLayer(nn.Module):
    def __init__(self, hidden, heads, inter):
        super().__init__()
        self.attention = nn.Module()
        self.attention.self = nn.Module()
        self.attention.self.query = nn.Linear(hidden, hidden)
        self.attention.self.key = nn.Linear(hidden, hidden)
        self.attention.self.value = nn.Linear(hidden, hidden)
        self.attention.output = nn.Module()
        self.attention.output.dense = nn.Linear(hidden, hidden)
        self.attention.output.LayerNorm = nn.LayerNorm(hidden, eps=1e-12)
        self.mlp = nn.Module()
        self.mlp.gated_layers = nn.Linear(hidden, 2 * inter, bias=False)
        self.mlp.wo = nn.Linear(inter, hidden)
        self.mlp.layernorm = nn.LayerNorm(hidden, eps=1e-12)
        self.heads, self.inter = heads, inter

    def forward(self, x, mask):
        B, S, D = x.shape
        sh = (B, S, self.heads, D // self.heads)
        q = self.attention.self.query(x).view(sh)
        k = self.attention.self.key(x).view(sh)
        v = self.attention.self.value(x).view(sh)
        dist = (torch.arange(S)[:, None] - torch.arange(S)[None, :]).abs().float()
        bias = -alibi_slopes(self.heads)[:, None, None] * dist  # [H, S, S]
        a = self.attention.output.dense(sdpa(q, k, v, mask, bias).reshape(B, S, D))
        x = self.attention.output.LayerNorm(x + a)
        gu = self.mlp.gated_layers(x)
        gate, up = gu[..., : self.inter], gu[..., self.inter:]  # act on FIRST
        h = self.mlp.wo(F.gelu(gate) * up)
        return self.mlp.layernorm(x + h)


class JinaReplica(nn.Module):
    def __init__(self, vocab=64, hidden=32, layers=2, heads=4, inter=48,
                 type_vocab=2):
        super().__init__()
        self.embeddings = _Embeddings(vocab, hidden, type_vocab)
        self.encoder = nn.Module()
        self.encoder.layer = nn.ModuleList(
            [_JinaLayer(hidden, heads, inter) for _ in range(layers)]
        )

    def forward(self, ids, mask):
        x = self.embeddings(ids)
        for lyr in self.encoder.layer:
            x = lyr(x, mask)
        return x
