"""Tests for the from-scratch CLIP BPE tokenizer (utils/bpe.py).

The reference tokenizes CLIP-score prompts with open_clip's SimpleTokenizer
and SD captions with transformers' CLIPTokenizer (diff-solvers-main/
clip_score.py:59).  These tests pin the in-repo algorithm against
hand-computed merges and -- crucially -- against transformers' own
CLIPTokenizer instantiated from LOCAL synthetic vocab files (true
cross-implementation parity, no network).  A gated test runs against the
real 49k vocab whenever one is cached on disk.
"""

import gzip
import json
import os

import numpy as np
import pytest

from diff_sampler_tpu.utils.bpe import (SimpleBPETokenizer, bytes_to_unicode,
                                        find_vocab_file)

# a tiny but realistic merge table: enough rules to produce multi-level
# merges ("lo"+"w</w>" builds on "l"+"o") and rank-priority conflicts
MERGES = [
    ("l", "o"),
    ("lo", "w</w>"),
    ("e", "r</w>"),
    ("h", "i</w>"),
    ("lo", "w"),
    ("low", "er</w>"),
    ("c", "a"),
    ("ca", "t</w>"),
]


@pytest.fixture(scope="module")
def tok():
    return SimpleBPETokenizer(MERGES)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256  # injective
    assert m[ord("a")] == "a"           # printable ASCII maps to itself


def test_vocab_layout(tok):
    # 256 chars + 256 char</w> + merges + SOT/EOT, ids in that order
    assert tok.sot_id == 512 + len(MERGES)
    assert tok.eot_id == tok.sot_id + 1
    assert tok.encoder["lo"] == 512  # first merge
    assert tok.encoder["low</w>"] == 513


def test_greedy_merge_order(tok):
    # "lower" -> l o w e r</w> -> lo ... -> low er</w> -> lower</w>? no:
    # ("low","er</w>") is ranked, so the final word is one token
    ids = tok.encode("lower")
    assert ids == [tok.encoder["lower</w>"]]
    # "low" uses the ("lo","w</w>") rule, NOT ("lo","w")
    assert tok.encode("low") == [tok.encoder["low</w>"]]
    # unknown single letters stay as char + char</w>
    assert tok.encode("xy") == [tok.encoder["x"], tok.encoder["y</w>"]]


def test_word_split_and_lowercase(tok):
    # regex splits words/punctuation; cleaning lowercases and collapses ws
    a = tok.encode("LOW  cat")
    b = tok.encode("low cat")
    assert a == b
    assert tok.encoder["cat</w>"] in a


def test_framing_padding_truncation(tok):
    out = tok(["low"])
    assert out.shape == (1, 77)
    assert out[0, 0] == tok.sot_id
    assert out[0, 1] == tok.encoder["low</w>"]
    assert out[0, 2] == tok.eot_id
    assert (out[0, 3:] == 0).all()  # open_clip zero padding
    # truncation keeps EOT last
    long = tok([" ".join(["low"] * 200)])
    assert long[0, -1] == tok.eot_id
    assert (long[0] != 0).all()


def test_eot_padding_mode():
    t = SimpleBPETokenizer(MERGES, pad_id=0)
    t.pad_id = t.eot_id
    out = t(["low"])
    assert (out[0, 2:] == t.eot_id).all()


def test_decode_roundtrip(tok):
    for s in ["lower low", "hi cat", "a b c xyz"]:
        assert tok.decode(tok.encode(s)) == s


def test_utf8_bytes(tok):
    # non-ASCII goes through the byte map without KeyErrors
    ids = tok.encode("café")
    assert all(isinstance(i, int) for i in ids)
    assert tok.decode(ids) == "café"


def test_merges_file_formats(tmp_path, tok):
    lines = ["#version: 0.2"] + [f"{a} {b}" for a, b in MERGES]
    hf = tmp_path / "merges.txt"
    hf.write_text("\n".join(lines) + "\n")
    t_hf = SimpleBPETokenizer.from_file(str(hf))
    gz = tmp_path / "bpe_simple_vocab_16e6.txt.gz"
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        f.write("bpe version banner\n" + "\n".join(l for l in lines[1:]) + "\n")
    t_gz = SimpleBPETokenizer.from_file(str(gz))
    text = "lower cats hi"
    assert t_hf.encode(text) == tok.encode(text) == t_gz.encode(text)


def test_find_vocab_env(tmp_path, monkeypatch):
    p = tmp_path / "merges.txt"
    p.write_text("#version: 0.2\nl o\n")
    monkeypatch.setenv("CLIP_BPE_VOCAB", str(p))
    assert find_vocab_file() == str(p)
    t = SimpleBPETokenizer.from_default_paths()
    assert t.encoder["lo"] == 512


def _write_hf_tokenizer_files(tok, tmp_path):
    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(tok.encoder, ensure_ascii=False))
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n")
    return str(vocab_file), str(merges_file)


def test_parity_vs_transformers_local_vocab(tok, tmp_path):
    """True cross-impl parity: transformers' CLIPTokenizer built from the
    SAME synthetic vocab must produce identical ids (EOT-padded mode)."""
    from transformers import CLIPTokenizer

    vocab_file, merges_file = _write_hf_tokenizer_files(tok, tmp_path)
    ref = CLIPTokenizer(vocab_file, merges_file)
    mine = SimpleBPETokenizer(MERGES)
    mine.pad_id = mine.eot_id
    prompts = [
        "lower low cat",
        "Hi, LOW!  cats & dogs; it's low-er.",
        "a photo of a cat 123",
        "x" * 300 + " low",  # truncation
        "café über low",  # non-ASCII bytes
    ]
    got = mine(prompts)
    want = ref(prompts, truncation=True, max_length=77,
               padding="max_length", return_tensors="np")["input_ids"]
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(find_vocab_file() is None,
                    reason="no real CLIP BPE vocab artifact on disk")
def test_real_vocab_if_present():
    """Gated: with the real 49k-merge artifact, the vocab has the published
    size and known token ids."""
    t = SimpleBPETokenizer.from_default_paths()
    assert len(t.encoder) == 49408
    assert t.sot_id == 49406 and t.eot_id == 49407
    ids = t(["a photo of a cat"])
    assert ids.shape == (1, 77) and ids[0, 0] == 49406
