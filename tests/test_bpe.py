"""Native CLIP BPE tokenizer vs transformers' CLIPTokenizer (VERDICT r4
item 7: arbitrary-prompt support; reference surface
run_content_inversion_sd.py:39).

A real-structure fixture vocabulary (256 byte symbols + 256 ``</w>`` byte
symbols + a merge chain + the two specials) is written as
``vocab.json``/``merges.txt`` and loaded by BOTH implementations; ids must
match token-for-token on prompts covering the regex split, contractions,
multi-merge words, unicode, CJK spacing, truncation, and padding. The same
files a released SD checkpoint ships are read through the same loader, so
parity on the fixture pins parity on weights-day files."""

import json
import os

import numpy as np
import pytest

from univst_tpu.models.bpe import BOS, EOS, ClipBPE, bytes_to_unicode

PROMPTS = [
    "a photo of a duck",
    "The   quick brown fox jumps over 12 lazy dogs!",
    "don't stop, won't stop...",
    "café ☕ naïve",
    "你好 world",
    "",
    "x" * 400,  # truncation
]

MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("o", "f</w>"),
    ("d", "u"),
    ("du", "c"),
    ("duc", "k</w>"),
    ("o", "n"),
    ("'", "t</w>"),
    ("q", "u"),
    ("a</w>", None),  # marker: single-byte-with-</w> already in base vocab
]


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    syms = list(bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(syms)}
    vocab.update({s + "</w>": 256 + i for i, s in enumerate(syms)})
    nxt = 512
    lines = ["#version: 0.2"]
    for a, b in MERGES:
        if b is None:
            continue
        lines.append(f"{a} {b}")
        vocab[a + b] = nxt
        nxt += 1
    vocab[BOS] = nxt
    vocab[EOS] = nxt + 1
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (d / "merges.txt").write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(d)


def test_matches_transformers_clip_tokenizer(vocab_dir):
    hf = pytest.importorskip("transformers")
    ref = hf.CLIPTokenizer.from_pretrained(vocab_dir)
    ours = ClipBPE.from_dir(vocab_dir)
    for prompt in PROMPTS:
        want = ref(
            [prompt], padding="max_length", max_length=77, truncation=True,
            return_tensors="np",
        )["input_ids"].astype(np.int32)
        got = ours([prompt], max_len=77)
        np.testing.assert_array_equal(
            got, want, err_msg=f"prompt {prompt!r}"
        )


def test_empty_prompt_exact_encoding(vocab_dir):
    ours = ClipBPE.from_dir(vocab_dir)
    row = ours([""], max_len=8)[0]
    assert row[0] == ours.bos_id and (row[1:] == ours.eos_id).all()


def test_synthetic_vocab_structure_and_offline_prompts():
    bpe = ClipBPE.synthetic()
    assert len(bpe.encoder) == 49408
    assert bpe.bos_id == 49406 and bpe.eos_id == 49407
    ids = bpe(["a photo of a duck"], max_len=77)
    assert ids.shape == (1, 77)
    assert ids.min() >= 0 and ids.max() < 49408
    # byte-region ids are the REAL CLIP ids: 'a</w>' is byte 'a' + </w>
    a_ws = bpe.encoder["a</w>"]
    assert a_ws == 256 + list(bytes_to_unicode().keys()).index(ord("a"))
    assert a_ws in ids[0]


def test_shim_tokenizes_offline_and_from_files(vocab_dir, capsys):
    from univst_tpu.models.clip_text import Tokenizer

    ids = Tokenizer()(["a photo of a duck"])
    assert ids.shape == (1, 77) and ids.dtype == np.int32
    assert "synthetic byte-level" in capsys.readouterr().out
    ids2 = Tokenizer(hf_dir=vocab_dir)(["a photo of a duck"])
    assert ids2.shape == (1, 77)
    # empty prompt stays the exact null encoding in both modes
    from univst_tpu.models.clip_text import BOS_TOKEN, EOS_TOKEN

    null = Tokenizer()([""])[0]
    assert null[0] == BOS_TOKEN and (null[1:] == EOS_TOKEN).all()


def test_t5_byte_fallback_shapes():
    from univst_tpu.models.t5 import T5_EOS, T5_PAD, T5TokenizerShim

    tok = T5TokenizerShim(max_len=16)
    ids = tok(["hello", ""])
    assert ids.shape == (2, 16)
    assert ids[0][5] == T5_EOS and (ids[0][6:] == T5_PAD).all()
    assert ids[1][0] == T5_EOS and (ids[1][1:] == T5_PAD).all()
    assert ids.max() < 256 + 3
