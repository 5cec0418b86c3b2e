"""Offline vocabulary builders.

Semantics match `basic_vqa/utils/make_vacabs_for_questions_answers.py` and
the unified variant (`darts_vqa/utils/make_vacabs_for_questions_answers.py:
68-110`) exactly — question vocab is sorted unique tokens with
<pad>,<unk>,<start>,<end> at indices 0-3; answer vocab is <unk> + top
(n-1) most frequent answers containing no punctuation; unified vocab merges
both (answers split into words) and adds <sep> at index 4.
"""

from __future__ import annotations

import json
import os
import re
from collections import defaultdict
from typing import Iterable, List

from lctvqa.text import SENTENCE_SPLIT_REGEX

_NON_WORD = re.compile(r"[^\w\s]")


def _question_tokens(question: str) -> List[str]:
    words = SENTENCE_SPLIT_REGEX.split(question.lower())
    return [w.strip() for w in words if len(w.strip()) > 0]


def _iter_json_files(input_dir: str) -> Iterable[str]:
    for name in sorted(os.listdir(input_dir)):
        yield os.path.join(input_dir, name)


def make_vocab_questions(question_dir: str, out_file: str) -> List[str]:
    """Scan VQA question jsons, write one word per line."""
    vocab_set = set()
    for path in _iter_json_files(question_dir):
        with open(path) as f:
            questions = json.load(f)["questions"]
        for q in questions:
            vocab_set.update(_question_tokens(q["question"]))
    vocab_list = sorted(vocab_set)
    vocab_list = ["<pad>", "<unk>", "<start>", "<end>"] + vocab_list
    with open(out_file, "w") as f:
        f.writelines(w + "\n" for w in vocab_list)
    return vocab_list


def make_vocab_answers(annotation_dir: str, out_file: str,
                       n_answers: int = 1000) -> List[str]:
    """Top-(n-1) punctuation-free answers by frequency, behind <unk>."""
    counts = defaultdict(int)
    for path in _iter_json_files(annotation_dir):
        with open(path) as f:
            annotations = json.load(f)["annotations"]
        for ann in annotations:
            for answer in ann["answers"]:
                word = answer["answer"]
                if _NON_WORD.search(word):
                    continue
                counts[word] += 1
    ranked = sorted(counts, key=counts.get, reverse=True)
    assert "<unk>" not in ranked
    top = ["<unk>"] + ranked[: n_answers - 1]
    with open(out_file, "w") as f:
        f.writelines(w + "\n" for w in top)
    return top


def make_vocab_unified(question_dir: str, annotation_dir: str,
                       out_file: str, n_answers: int = 1000) -> List[str]:
    """Merged question+answer-word vocab with <sep> as 5th special token
    (darts_vqa/utils/make_vacabs_for_questions_answers.py:68-110)."""
    vocab_set = set()
    for path in _iter_json_files(question_dir):
        with open(path) as f:
            questions = json.load(f)["questions"]
        for q in questions:
            vocab_set.update(_question_tokens(q["question"]))
    counts = defaultdict(int)
    for path in _iter_json_files(annotation_dir):
        with open(path) as f:
            annotations = json.load(f)["annotations"]
        for ann in annotations:
            for answer in ann["answers"]:
                word = answer["answer"]
                if _NON_WORD.search(word):
                    continue
                counts[word] += 1
    ranked = sorted(counts, key=counts.get, reverse=True)
    for ans in ranked[: n_answers - 1]:
        vocab_set.update(ans.split())
    vocab_list = sorted(vocab_set)
    vocab_list = ["<pad>", "<unk>", "<start>", "<end>", "<sep>"] + vocab_list
    with open(out_file, "w") as f:
        f.writelines(w + "\n" for w in vocab_list)
    return vocab_list
