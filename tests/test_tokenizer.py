"""Tokenizer golden tests: our from-scratch BPE must produce the canonical
CLIP token ids (well-known public goldens) and round-trip."""
import numpy as np

from segclip_tpu.data.tokenizer import default_tokenizer, tokenize_with_mask


def test_specials():
    tok = default_tokenizer()
    assert tok.bos_id == 49406
    assert tok.eos_id == 49407
    assert len(tok.encoder) == 49408


def test_known_goldens():
    tok = default_tokenizer()
    # canonical CLIP ids for these words (stable public vocabulary)
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]
    assert tok.encode("hello world") == [3306, 1002]
    assert tok.encode("a diagram") == [320, 22697]


def test_roundtrip():
    """decode(encode(x)) recovers the lowercased words (canonical CLIP decode
    emits a space after every word-final token, so punctuation detaches)."""
    tok = default_tokenizer()
    for text in ("a photo of a dog", "two people riding bikes",
                 "an AERIAL view of the CITY"):
        ids = tok.encode(text)
        back = tok.decode(ids).strip()
        assert back == text.lower(), (text, back)
    assert tok.decode(tok.encode("a dog.")).strip() == "a dog ."


def test_tokenize_padding_and_truncation():
    tok = default_tokenizer()
    row = tok.tokenize("a photo of a cat", 12)
    assert row.shape == (12,)
    assert row[0] == 49406 and row[6] == 49407
    assert (row[7:] == 0).all()
    # truncation: long text still ends with EOS at the last slot
    long_row = tok.tokenize(" ".join(["cat"] * 50), 12)
    assert long_row[0] == 49406 and long_row[-1] == 49407


def test_tokenize_with_mask():
    tok = default_tokenizer()
    ids, mask = tokenize_with_mask(tok, "a photo of a cat", 12)
    np.testing.assert_array_equal(mask, (ids != 0).astype(np.int32))
    assert mask.sum() == 7


def test_mask_keeps_bpe_id_zero_tokens():
    """BPE id 0 is the non-final '!' piece — the attention mask must be
    length-based, not (ids != 0) (regression)."""
    tok = default_tokenizer()
    ids = tok.encode("wow !(")
    assert 0 in ids, "expected the '!(' bigram to produce token id 0"
    row, mask = tokenize_with_mask(tok, "wow !(", 12)
    n = 2 + len(ids)            # BOS + tokens + EOS
    np.testing.assert_array_equal(mask[:n], np.ones(n, np.int32))
    np.testing.assert_array_equal(mask[n:], np.zeros(12 - n, np.int32))
