"""Builders for tiny, locally-constructed HF models + tokenizers.

No network access exists in this environment, so tests stand in for hub
checkpoints with small randomly-initialised HF models saved to local
directories — exercising the exact same load→convert→device path used for real
checkpoints (tokenizer files, config.json, safetensors).
"""

import hashlib
import os
import shutil

import torch

# bump to invalidate cached checkpoints after changing a builder's weights
_CACHE_VERSION = 1
_CACHE_ROOT = os.environ.get(
    "BERGEN_TPU_TINY_MODEL_CACHE", "/tmp/bergen_tpu_tiny_models"
)


def _cached_build(name: str, out_dir: str, key_parts, build_fn) -> str:
    """Builders are deterministic (seeded torch init over a stable fixture
    vocab), so identical (builder, kwargs) across tests and sessions produce
    identical checkpoints — build once into a content-keyed cache dir and
    copy (<1 MB) into each caller's out_dir.  Round-2 rebuilt tiny models
    per test module, a measurable slice of suite wall-clock."""
    key = hashlib.md5(
        repr((name, _CACHE_VERSION, key_parts)).encode()
    ).hexdigest()[:12]
    cache = os.path.join(_CACHE_ROOT, f"{name}-{key}")
    done = os.path.join(cache, ".done")
    if not os.path.exists(done):
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        build_fn(cache)
        with open(done, "w") as f:
            f.write("ok")
    if os.path.abspath(out_dir) != os.path.abspath(cache):
        shutil.copytree(cache, out_dir, dirs_exist_ok=True)
    return out_dir


def _word_vocab():
    """Vocabulary covering the synthetic fixture corpus (tests/utdata)."""
    words = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for fname in ("ut1_docs.tsv", "ut1_queries.tsv"):
        with open(os.path.join(here, "utdata", fname)) as f:
            for line in f:
                for tok in line.lower().replace("\t", " ").split():
                    words.add(tok.strip(".,?!"))
    return sorted(words)


def build_tiny_bert(out_dir: str, with_mlm: bool = False, num_labels: int | None = None,
                    hidden: int = 64, layers: int = 2, seed: int = 0) -> str:
    """Create a tiny BERT (+WordPiece tokenizer over the fixture vocab) at
    out_dir; returns out_dir (usable as model_name).  Cached by args."""
    return _cached_build(
        "bert", out_dir, (with_mlm, num_labels, hidden, layers, seed),
        lambda d: _build_tiny_bert(d, with_mlm, num_labels, hidden, layers,
                                   seed),
    )


def _build_tiny_bert(out_dir: str, with_mlm: bool, num_labels: int | None,
                     hidden: int, layers: int, seed: int) -> str:
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers
    from transformers import (
        BertConfig, BertForMaskedLM, BertForSequenceClassification, BertModel,
        PreTrainedTokenizerFast,
    )

    os.makedirs(out_dir, exist_ok=True)
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab = {tok: i for i, tok in enumerate(specials + _word_vocab())}
    wp = Tokenizer(models.WordPiece(vocab, unk_token="[UNK]"))
    wp.normalizer = normalizers.Sequence(
        [normalizers.Lowercase(), normalizers.StripAccents()]
    )
    wp.pre_tokenizer = pre_tokenizers.Sequence(
        [pre_tokenizers.Whitespace(), pre_tokenizers.Punctuation("removed")]
    )
    tok = PreTrainedTokenizerFast(
        tokenizer_object=wp, pad_token="[PAD]", unk_token="[UNK]",
        cls_token="[CLS]", sep_token="[SEP]", mask_token="[MASK]",
    )
    # BERT-style single/pair post-processing
    from tokenizers.processors import TemplateProcessing

    wp.post_processor = TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B:1 [SEP]:1",
        special_tokens=[("[CLS]", vocab["[CLS]"]), ("[SEP]", vocab["[SEP]"])],
    )
    tok.save_pretrained(out_dir)

    torch.manual_seed(seed)
    cfg = BertConfig(
        vocab_size=len(vocab), hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=4, intermediate_size=hidden * 4,
        max_position_embeddings=512, type_vocab_size=2,
        pad_token_id=vocab["[PAD]"],
    )
    if with_mlm:
        model = BertForMaskedLM(cfg)
    elif num_labels is not None:
        cfg.num_labels = num_labels
        model = BertForSequenceClassification(cfg)
    else:
        model = BertModel(cfg)
    model.save_pretrained(out_dir)
    return out_dir


def build_tiny_llama(out_dir: str, hidden: int = 64, layers: int = 2,
                     seed: int = 0, vocab_extra: int = 0,
                     rope_scaling: dict | None = None) -> str:
    """Create a tiny LlamaForCausalLM + word-level tokenizer with a chat
    template, saved to out_dir.  Cached by args."""
    key = (hidden, layers, seed, vocab_extra,
           tuple(sorted(rope_scaling.items())) if rope_scaling else None)
    return _cached_build(
        "llama", out_dir, key,
        lambda d: _build_tiny_llama(d, hidden, layers, seed, vocab_extra,
                                    rope_scaling),
    )


def _build_tiny_llama(out_dir: str, hidden: int, layers: int, seed: int,
                      vocab_extra: int, rope_scaling: dict | None) -> str:
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    os.makedirs(out_dir, exist_ok=True)
    specials = ["<pad>", "<unk>", "<s>", "</s>"]
    vocab = {t: i for i, t in enumerate(specials + _word_vocab())}
    for i in range(vocab_extra):
        vocab[f"<extra_{i}>"] = len(vocab)
    wl = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    wl.normalizer = normalizers.Lowercase()
    wl.pre_tokenizer = pre_tokenizers.Sequence(
        [pre_tokenizers.Whitespace(), pre_tokenizers.Punctuation("removed")]
    )
    tok = PreTrainedTokenizerFast(
        tokenizer_object=wl, pad_token="<pad>", unk_token="<unk>",
        bos_token="<s>", eos_token="</s>",
    )
    tok.chat_template = (
        "{% for message in messages %}"
        "{{ message['role'] }} : {{ message['content'] }} \n "
        "{% endfor %}"
        "{% if add_generation_prompt %}assistant : {% endif %}"
    )
    tok.save_pretrained(out_dir)

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=len(vocab), hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=hidden * 2, max_position_embeddings=512,
        pad_token_id=vocab["<pad>"], bos_token_id=vocab["<s>"],
        eos_token_id=vocab["</s>"], tie_word_embeddings=False,
        rope_scaling=rope_scaling,
    )
    model = LlamaForCausalLM(cfg)
    model.save_pretrained(out_dir)
    return out_dir
