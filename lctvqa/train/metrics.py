"""Evaluation metrics (reference `basic_vqa/misc.py`, `darts_vqa/misc.py`).

Device-side: multi-choice correctness and question token-error counts
(computed inside jitted eval steps). Host-side: BLEU4 via nltk against the
npy question references — kept off the step's critical path.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np


class VqaStruct:
    """image_name -> [question tokens] (and qst+ans for the unified model)
    reference maps for BLEU (misc.py:7-40, darts_vqa/misc.py:8-60)."""

    def __init__(self, input_dir: str, data_file: str = "valid.npy",
                 seed: int = 0):
        self.vqa = np.load(os.path.join(input_dir, data_file),
                           allow_pickle=True)
        self.img_to_qst = defaultdict(list)
        self.img_to_qa = defaultdict(list)
        rng = np.random.RandomState(seed)
        for entry in self.vqa:
            name = entry["image_name"]
            self.img_to_qst[name].append(entry["question_tokens"])
            if "valid_answers" in entry:
                ans = entry["valid_answers"][
                    rng.randint(len(entry["valid_answers"]))]
                self.img_to_qa[name].append(
                    entry["question_tokens"] + ["<sep>", ans])

    def get_ref_qst(self, img_name: str):
        ref = self.img_to_qst[img_name]
        assert ref
        return ref

    def get_ref_qa(self, img_name: str):
        ref = self.img_to_qa[img_name]
        assert ref
        return ref

    def qst_cnt_histogram(self):
        hist = np.zeros(1000, dtype=int)
        for v in self.img_to_qst.values():
            hist[len(v)] += 1
        return hist


def num_correct(pred, multi_choice) -> jnp.ndarray:
    """Count of predictions matching ANY multi-choice answer
    (misc.py:42-45). pred [B], multi_choice [B, 10] with -1 padding.
    Works on device inside jit."""
    pred = jnp.asarray(pred)
    mc = jnp.asarray(multi_choice)
    return jnp.sum(jnp.any(mc == pred[:, None], axis=1))


def mask_unk(pred, unk_idx: int):
    """Replace <unk> predictions with -9999 (experiment.py:232) so they
    never match a multi-choice answer."""
    pred = jnp.asarray(pred)
    return jnp.where(pred == unk_idx, -9999, pred)


def num_correct_qst(qst_logits, qst):
    """(exact, <=3 errors, <=5 errors) counts (misc.py:47-58)."""
    pred = jnp.argmax(jnp.asarray(qst_logits), axis=2)[:, :-1]
    tgt = jnp.asarray(qst)[:, 1:]
    err = jnp.sum(pred != tgt, axis=1)
    return (jnp.sum(err == 0), jnp.sum(err <= 3), jnp.sum(err <= 5))


def BLEU4(ref_qst, pred_qst) -> float:
    from nltk.translate.bleu_score import (SmoothingFunction, sentence_bleu)
    return 100 * sentence_bleu(ref_qst, pred_qst,
                               smoothing_function=SmoothingFunction().method1)


def calc_bleu_scores(image_names: Sequence[str], pred_qsts, qst_vocab,
                     vqa_struct: VqaStruct) -> float:
    """Mean BLEU4 of generated questions vs all reference questions of the
    image (misc.py:64-73). pred_qsts: int array [B, T]."""
    preds = [qst_vocab.arr2qst(np.asarray(q)).split() for q in pred_qsts]
    total = 0.0
    for name, pred in zip(image_names, preds):
        total += BLEU4(vqa_struct.get_ref_qst(name), pred)
    return total / len(image_names)


def calc_bleu_scores_unified(image_names, pred_qas, unified_vocab,
                             vqa_struct: VqaStruct) -> float:
    preds = [unified_vocab.arr2qst(np.asarray(qa)).split()
             for qa in pred_qas]
    total = 0.0
    for name, pred in zip(image_names, preds):
        total += BLEU4(vqa_struct.get_ref_qa(name), pred)
    return total / len(image_names)


def extract_answer(qa_ids, unified_vocab) -> str:
    """Words strictly between <sep> and <end> (darts_vqa/misc.py:107-122)."""
    words = [unified_vocab.word_list[int(i)] for i in qa_ids]
    ans: List[str] = []
    flag = False
    for w in words:
        if w == "<sep>":
            flag = True
            continue
        if w == "<end>":
            break
        if flag:
            ans.append(w)
    return " ".join(ans)


def unified_ans_acc(qa_gt, qa_pred, unified_vocab) -> float:
    """Exact answer-string match rate (darts_vqa/misc.py:124-133)."""
    assert len(qa_gt) == len(qa_pred)
    corr = sum(
        extract_answer(np.asarray(g), unified_vocab)
        == extract_answer(np.asarray(p), unified_vocab)
        for g, p in zip(qa_gt, qa_pred))
    return corr / len(qa_gt)
