"""Offline builders + input pipeline tests against the synthetic fixture
(format-identical to the reference's preprocessed artifacts)."""

import os

import numpy as np
import pytest

from lctvqa.data import pipeline, preprocess
from lctvqa.text import VocabDict, tokenize


def test_tokenize_reference_semantics():
    assert tokenize("What is the man holding?") == \
        ["what", "is", "the", "man", "holding", "?"]
    assert tokenize("  Hello,   world!! ") == ["hello", ",", "world", "!!"]


def test_vocab_files(synth_dir):
    qv = VocabDict(os.path.join(synth_dir, "vocab_questions.txt"))
    av = VocabDict(os.path.join(synth_dir, "vocab_answers.txt"))
    uv = VocabDict(os.path.join(synth_dir, "vocab_unified.txt"))
    # special token layout (make_vacabs_for_questions_answers.py:28-31,57;
    # darts_vqa variant adds <sep> at 4)
    assert qv.word_list[:4] == ["<pad>", "<unk>", "<start>", "<end>"]
    assert av.word_list[0] == "<unk>"
    assert uv.word_list[:5] == ["<pad>", "<unk>", "<start>", "<end>",
                                "<sep>"]
    assert qv.unk2idx == 1
    # word2idx falls back to <unk>
    assert qv.word2idx("zzz_not_in_vocab") == qv.unk2idx


def test_process_punctuation_golden():
    # mirrors the VQA-eval normalization quirks (preprocess_qa.py:54-66)
    assert preprocess.process_punctuation("red, and black!") == \
        "red and black"
    assert preprocess.process_punctuation("1,000") == "1000"
    assert preprocess.process_punctuation("no punctuation") == \
        "no punctuation"


def test_encode_question_golden():
    t2i = {"<pad>": 0, "<unk>": 1, "<start>": 2, "<end>": 3, "cat": 5}
    vec, qlen = preprocess.encode_question(["cat", "zzz"], t2i, 6)
    np.testing.assert_array_equal(vec, [2, 5, 0, 3, 0, 0])
    assert qlen == 3  # len(question)+1 for <start>


def test_encode_answers_count_vector():
    a2i = {"yes": 0, "no": 1}
    vec = preprocess.encode_answers(["yes", "yes", "no", "zzz"], a2i)
    np.testing.assert_array_equal(vec, [2, 1])


def test_h5_dataset_and_batches(synth_dir):
    data = pipeline.get_loader(synth_dir, batch_size=4)
    train = data["train"]
    assert len(train) == 24
    rng = np.random.default_rng(0)
    batches = list(pipeline.epoch_batches(train, 4, rng))
    assert len(batches) == 6
    b = batches[0]
    assert b["image_u8"].shape == (4, 16, 16, 3)
    assert b["image_u8"].dtype == np.uint8
    assert b["question"].shape == (4, 25)
    assert b["answer_label"].shape == (4,)
    assert b["answer_multi_choice"].shape == (4, 10)
    # answer_label must be one of the valid answers (or <unk>)
    for i in range(4):
        mc = b["answer_multi_choice"][i]
        valid = mc[mc >= 0]
        if len(valid):
            assert b["answer_label"][i] in valid
        else:
            assert b["answer_label"][i] == train.ans_vocab.unk2idx


def test_multi_choice_padding(synth_dir):
    train = pipeline.VqaH5Dataset(synth_dir, "train")
    rng = np.random.default_rng(1)
    batch = train.gather(np.arange(len(train)), rng)
    mc = batch["answer_multi_choice"]
    n_valid = (train.enc_ans > 0).sum(axis=1)
    for i in range(len(train)):
        expect = min(n_valid[i], 10)
        assert (mc[i] >= 0).sum() == expect
        assert (mc[i, expect:] == -1).all()


def test_normalize_images_matches_torchvision_transform(synth_dir):
    import torch

    import jax.numpy as jnp
    train = pipeline.VqaH5Dataset(synth_dir, "train")
    u8 = train.images[:2]
    ours = np.asarray(pipeline.normalize_images(jnp.asarray(u8)))
    # torchvision ToTensor + Normalize equivalent
    x = torch.tensor(u8).permute(0, 3, 1, 2).float() / 255.0
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    theirs = ((x - mean) / std).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_prefetcher_roundtrip(synth_dir):
    train = pipeline.VqaH5Dataset(synth_dir, "train")
    rng = np.random.default_rng(2)
    it = pipeline.epoch_batches(train, 4, rng)
    got = list(pipeline.Prefetcher(it, depth=2))
    assert len(got) == 6
    assert got[0]["image_u8"].shape == (4, 16, 16, 3)


def test_prefetcher_propagates_worker_errors(synth_dir):
    """A producer-thread failure must raise in the consumer, not silently
    end the epoch (VERDICT round-1 weak #4)."""
    train = pipeline.VqaH5Dataset(synth_dir, "train")
    rng = np.random.default_rng(3)

    def poisoned():
        yield from pipeline.epoch_batches(train, 4, rng)
        raise ValueError("corrupt batch")

    pf = pipeline.Prefetcher(poisoned(), depth=2)
    with pytest.raises(ValueError, match="corrupt batch"):
        list(pf)


def test_lazy_h5_preload_matches_ram(synth_dir):
    """preload='lazy' (chunked h5 reads; the 224px-scale path, VERDICT r1
    weak #7) yields byte-identical batches to the RAM-resident path."""
    ram = pipeline.VqaH5Dataset(synth_dir, "train", preload="ram")
    lazy = pipeline.VqaH5Dataset(synth_dir, "train", preload="lazy")
    assert isinstance(ram.images, np.ndarray)
    assert not isinstance(lazy.images, np.ndarray)
    idx = np.array([5, 3, 3, 20, 0, 11], np.int32)  # dup + unsorted
    b_ram = ram.gather(idx, np.random.default_rng(7))
    b_lazy = lazy.gather(idx, np.random.default_rng(7))
    np.testing.assert_array_equal(b_ram["image_u8"], b_lazy["image_u8"])
    np.testing.assert_array_equal(b_ram["question"], b_lazy["question"])
    np.testing.assert_array_equal(b_ram["answer_label"],
                                  b_lazy["answer_label"])


def test_gather_num_workers_parity(synth_dir):
    """Threaded native gather returns the same batch as single-threaded."""
    train = pipeline.VqaH5Dataset(synth_dir, "train")
    idx = np.arange(len(train), dtype=np.int32)[::-1].copy()
    b1 = train.gather(idx, np.random.default_rng(5), num_workers=1)
    b4 = train.gather(idx, np.random.default_rng(5), num_workers=4)
    np.testing.assert_array_equal(b1["image_u8"], b4["image_u8"])
    np.testing.assert_array_equal(b1["answer_label"], b4["answer_label"])


def test_npy_records(synth_dir):
    recs = np.load(os.path.join(synth_dir, "valid.npy"), allow_pickle=True)
    assert len(recs) == 24
    r = recs[0]
    assert set(r) >= {"image_name", "image_path", "question_id",
                      "question_str", "question_tokens", "all_answers",
                      "valid_answers"}
    assert r["valid_answers"]  # never empty (falls back to ['<unk>'])
