"""GLUE pipeline tests: TSV parsing, WordPiece tokenization (parity vs
transformers.BertTokenizer), batching, metrics, and the nlp.py E2E path."""

import os

import numpy as np
import pytest

from fp8_quantization_tpu.eval import glue


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "movie", "was", "great", "terrible", "un", "##believ", "##able",
    "##s", "##ly", "act", "##ing", ".", ",", "!", "?", "'", "a", "b", "c",
]


def test_wordpiece_basic():
    tok = glue.WordPieceTokenizer(VOCAB)
    assert tok.tokenize("The movie was GREAT!") == [
        "the", "movie", "was", "great", "!"]
    # greedy longest-match with ## continuation
    assert tok.tokenize("unbelievable") == ["un", "##believ", "##able"]
    # unknown word -> [UNK]
    assert tok.tokenize("zzzqqq") == ["[UNK]"]
    # accents strip (uncased NFD)
    assert tok.tokenize("Thé") == ["the"]


def test_wordpiece_parity_vs_transformers(tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n")
    hf = transformers.BertTokenizer(str(vocab_file), do_lower_case=True)
    ours = glue.WordPieceTokenizer.from_file(str(vocab_file))
    texts = [
        "The movie was great!",
        "unbelievable acting, terribly great?!",
        "a b c unbelievables",
        "Thé   movie\twas...great",
        "zzz unbelievable' acting",
        "",
    ]
    for t in texts:
        assert ours.tokenize(t) == hf.tokenize(t), t
    # encode parity incl. specials and pair truncation
    for a, b in [("the movie was great", None),
                 ("unbelievable acting" * 8, "the movie was terrible" * 8)]:
        enc = hf(a, b, max_length=32, truncation=True, padding="max_length")
        ids, mask, types = glue.encode_pair(ours, a, b, 32)
        assert ids == enc["input_ids"]
        assert mask == enc["attention_mask"]
        assert types == enc["token_type_ids"]


# ---------------------------------------------------------------------------
# TSV parsing
# ---------------------------------------------------------------------------

def _write(path, lines):
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def test_load_sst2(tmp_path):
    _write(tmp_path / "dev.tsv", [
        "sentence\tlabel",
        "the movie was great\t1",
        "terrible acting\t0",
        "malformed-row",
    ])
    ex = glue.load_examples(str(tmp_path), glue.GLUE_TASKS["sst-2"], "dev")
    assert len(ex) == 2
    assert ex[0].text_a == "the movie was great" and ex[0].label == 1.0
    assert ex[1].text_b is None


def test_load_mnli_and_stsb(tmp_path):
    pad = ["x"] * 8
    _write(tmp_path / "dev_matched.tsv", [
        "\t".join(["h"] * 12),
        "\t".join(pad + ["premise one", "hypothesis one", "x",
                         "entailment"]),
        "\t".join(pad + ["premise two", "hypothesis two", "x",
                         "contradiction"]),
    ])
    ex = glue.load_examples(str(tmp_path), glue.GLUE_TASKS["mnli"], "dev")
    assert [e.label for e in ex] == [1.0, 0.0]
    assert ex[0].text_a == "premise one" and ex[0].text_b == "hypothesis one"

    _write(tmp_path / "dev.tsv", [
        "\t".join(["h"] * 10),
        "\t".join(["x"] * 7 + ["sent a", "sent b", "3.6"]),
    ])
    ex = glue.load_examples(str(tmp_path), glue.GLUE_TASKS["sts-b"], "dev")
    assert ex[0].label == pytest.approx(3.6)
    assert glue.GLUE_TASKS["sts-b"].num_labels == 1


def test_load_cola_no_header(tmp_path):
    _write(tmp_path / "dev.tsv", [
        "src\t1\t*\tthe movie was great",
        "src\t0\t\tterrible",
    ])
    ex = glue.load_examples(str(tmp_path), glue.GLUE_TASKS["cola"], "dev")
    assert len(ex) == 2 and ex[0].label == 1.0


# ---------------------------------------------------------------------------
# Batching
# ---------------------------------------------------------------------------

def test_glue_batches_fixed_shape_and_padding():
    task, examples, tok = glue.synthetic_task(num_examples=10)
    batches = list(glue.glue_batches(examples, tok, batch_size=4, max_len=16))
    assert len(batches) == 3
    for (ids, mask, types), y, valid in batches:
        assert ids.shape == (4, 16) and mask.shape == (4, 16)
        assert types.shape == (4, 16) and y.shape == (4,)
    # final batch: 2 real rows padded to 4
    _, _, valid = batches[-1]
    assert valid.tolist() == [1.0, 1.0, 0.0, 0.0]
    # every row starts with [CLS]
    (ids, mask, _), _, _ = batches[0]
    assert (ids[:, 0] == tok.cls_id).all()
    # mask marks the non-pad prefix
    assert (ids[mask == 0] == tok.pad_id).all()


def test_pair_encoding_types():
    task, examples, tok = glue.synthetic_task(num_examples=4, pair=True)
    (ids, mask, types), _, _ = next(
        glue.glue_batches(examples, tok, batch_size=4, max_len=32))
    # token_type 1 appears (segment B) and only within the mask
    assert (types == 1).any()
    assert (types[mask == 0] == 0).all()


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def test_metrics_known_values():
    preds = np.array([1, 1, 0, 0, 1])
    labels = np.array([1, 0, 0, 1, 1])
    assert glue.accuracy_score(preds, labels) == pytest.approx(0.6)
    # tp=2 fp=1 fn=1 -> f1 = 2*2/(4+1+1)
    assert glue.f1_score(preds, labels) == pytest.approx(2 / 3)
    mcc = glue.matthews_corrcoef(preds, labels)
    # tp=2 tn=1 fp=1 fn=1 -> (2-1)/sqrt(3*3*2*2)
    assert mcc == pytest.approx(1 / 6)

    x = np.array([1.0, 2.0, 3.0, 4.0])
    assert glue.pearson_corr(x, 2 * x + 1) == pytest.approx(1.0)
    assert glue.pearson_corr(x, -x) == pytest.approx(-1.0)
    # spearman is rank-based: any monotone map gives 1
    assert glue.spearman_corr(x, x ** 3) == pytest.approx(1.0)
    # ties average ranks
    assert glue.spearman_corr(np.array([1.0, 1.0, 2.0]),
                              np.array([5.0, 5.0, 9.0])) == pytest.approx(1.0)


def test_compute_glue_metrics_dispatch():
    task = glue.GLUE_TASKS["mrpc"]
    m = glue.compute_glue_metrics(task, np.array([1, 0]), np.array([1, 1]))
    assert set(m) == {"accuracy", "f1"}
    task = glue.GLUE_TASKS["sts-b"]
    m = glue.compute_glue_metrics(task, np.array([1.0, 2.0, 3.0]),
                                  np.array([2.0, 4.0, 6.0]))
    assert m["pearson"] == pytest.approx(1.0)
    assert m["spearman"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# E2E through nlp.py (synthetic task, tiny model via monkeypatched spec)
# ---------------------------------------------------------------------------

def test_nlp_main_synthetic(monkeypatch):
    import dataclasses

    import fp8_quantization_tpu.models.bert as bert_mod
    import nlp

    tiny = dataclasses.replace(
        bert_mod.BERT_BASE, vocab_size=64, hidden_size=32, num_layers=1,
        num_heads=2, mlp_dim=64, max_position_embeddings=64)
    monkeypatch.setattr(nlp, "main", nlp.main)
    monkeypatch.setattr(bert_mod, "BERT_BASE", tiny)
    metrics = nlp.main([
        "--batch-size", "4", "--seq-len", "24",
        "--num-est-batches", "1", "--max-eval-batches", "3",
    ])
    assert "accuracy" in metrics and "f1" in metrics
    assert 0.0 <= metrics["accuracy"] <= 1.0


def test_nlp_main_glue_dir(monkeypatch, tmp_path):
    """nlp.py over an on-disk SST-2-format dataset + vocab file."""
    import dataclasses

    import fp8_quantization_tpu.models.bert as bert_mod
    import nlp

    _write(tmp_path / "dev.tsv", [
        "sentence\tlabel",
        "the movie was great\t1",
        "terrible acting\t0",
        "the movie was terrible\t0",
        "great great great\t1",
        "acting was great\t1",
    ])
    _write(tmp_path / "train.tsv", [
        "sentence\tlabel",
        "the movie was great\t1",
        "terrible\t0",
    ])
    _write(tmp_path / "vocab.txt", VOCAB)

    tiny = dataclasses.replace(
        bert_mod.BERT_BASE, vocab_size=len(VOCAB) + 8, hidden_size=32,
        num_layers=1, num_heads=2, mlp_dim=64, max_position_embeddings=64)
    monkeypatch.setattr(bert_mod, "BERT_BASE", tiny)
    metrics = nlp.main([
        "--data-dir", str(tmp_path), "--task", "sst-2",
        "--batch-size", "2", "--seq-len", "16",
    ])
    assert "accuracy" in metrics
