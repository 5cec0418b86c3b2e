"""Metric golden-value tests (ports of `darts_vqa/misc.py:136-196` inline
tests and `basic_vqa/misc.py` semantics)."""

import numpy as np

import jax.numpy as jnp

from lctvqa.text import VocabDict
from lctvqa.train import metrics


def test_num_correct():
    pred = jnp.asarray([3, 5, 7])
    mc = jnp.asarray([[3, 1, -1, -1, -1, -1, -1, -1, -1, -1],
                      [9, 9, 9, 9, 9, 9, 9, 9, 9, 9],
                      [1, 2, 7, -1, -1, -1, -1, -1, -1, -1]])
    assert int(metrics.num_correct(pred, mc)) == 2


def test_mask_unk():
    pred = jnp.asarray([0, 1, 2])
    out = metrics.mask_unk(pred, unk_idx=1)
    np.testing.assert_array_equal(np.asarray(out), [0, -9999, 2])


def test_num_correct_qst():
    # qst_pred [B, T, V]; target [B, T]
    v = 5
    tgt = jnp.asarray([[2, 3, 4, 3, 0]])
    logits = np.zeros((1, 5, v), np.float32)
    # predict exactly tgt shifted: pred[:, :-1] vs tgt[:, 1:]
    for t, w in enumerate([3, 4, 3, 0]):
        logits[0, t, w] = 9.0
    acc0, acc3, acc5 = metrics.num_correct_qst(jnp.asarray(logits), tgt)
    assert (int(acc0), int(acc3), int(acc5)) == (1, 1, 1)


def _unified_vocab():
    return VocabDict(word_list=["<pad>", "<unk>", "<start>", "<end>",
                                "<sep>", "red", "and", "black", "what",
                                "is"])


def test_extract_answer_golden():
    v = _unified_vocab()
    # '<start> what is <sep> red and black <end>'
    ids = [2, 8, 9, 4, 5, 6, 7, 3, 0, 0]
    assert metrics.extract_answer(ids, v) == "red and black"


def test_unified_ans_acc():
    v = _unified_vocab()
    gt = [[2, 8, 4, 5, 3], [2, 8, 4, 6, 3], [2, 8, 4, 7, 3]]
    pred = [[2, 9, 4, 5, 3], [2, 8, 4, 7, 3], [2, 8, 4, 7, 3]]
    # answers: gt = red/and/black; pred = red/black/black -> 2 of 3 match
    assert abs(metrics.unified_ans_acc(gt, pred, v) - 2 / 3) < 1e-9


def test_vqa_struct_and_bleu(synth_dir):
    vs = metrics.VqaStruct(synth_dir, "valid.npy")
    assert len(vs.img_to_qst) == 8  # num_images per split
    name = next(iter(vs.img_to_qst))
    refs = vs.get_ref_qst(name)
    assert refs and isinstance(refs[0], list)
    b4 = metrics.BLEU4(refs, refs[0])
    assert b4 > 99.0  # exact match scores ~100
    qa_refs = vs.get_ref_qa(name)
    assert "<sep>" in qa_refs[0]


def test_calc_bleu_scores(synth_dir):
    import os
    vs = metrics.VqaStruct(synth_dir, "valid.npy")
    qv = VocabDict(os.path.join(synth_dir, "vocab_questions.txt"))
    recs = np.load(os.path.join(synth_dir, "valid.npy"), allow_pickle=True)
    name = recs[0]["image_name"]
    toks = recs[0]["question_tokens"]
    ids = [qv.word2idx(w) for w in toks]
    b4 = metrics.calc_bleu_scores([name], [np.array(ids)], qv, vs)
    assert b4 > 50.0
