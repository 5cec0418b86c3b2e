"""Synthetic miniature VQA dataset generator.

The reference's module tests read the real preprocessed VQA v2 dataset from
disk (SURVEY.md §4); here tests and benchmarks use a deterministic synthetic
fixture with the exact on-disk formats of the offline builders: raw VQA-style
jsons (so the builders themselves are testable end-to-end), vocab text
files, images.h5 / qst-ans.h5, and train.npy / valid.npy records.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict

import numpy as np

_WORDS = ("what", "is", "the", "color", "of", "cat", "dog", "car", "man",
          "woman", "holding", "many", "how", "where", "red", "blue", "green",
          "ball", "table", "sky")
_ANSWERS = ("yes", "no", "red", "blue", "green", "two", "three", "cat",
            "dog", "white", "black", "1", "2", "frisbee", "tennis")


def make_raw_vqa_json(out_dir: str, num_images: int = 8,
                      num_questions: int = 24, seed: int = 0,
                      splits=("train2014", "val2014")) -> None:
    """Emit v2_OpenEnded_mscoco_*_questions.json /
    v2_mscoco_*_annotations.json in the VQA v2 schema."""
    rng = random.Random(seed)
    os.makedirs(os.path.join(out_dir, "Questions"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "Annotations"), exist_ok=True)
    for si, split in enumerate(splits):
        questions, annotations = [], []
        img_base = 1000 * (si + 1)
        for qi in range(num_questions):
            image_id = img_base + qi % num_images
            question_id = img_base * 100 + qi
            qwords = rng.sample(_WORDS, rng.randint(3, 6))
            questions.append({
                "question": " ".join(qwords).capitalize() + "?",
                "image_id": image_id,
                "question_id": question_id,
            })
            main_answer = rng.choice(_ANSWERS)
            answers = []
            for ai in range(10):
                a = main_answer if rng.random() < 0.7 else rng.choice(
                    _ANSWERS)
                answers.append({"answer": a, "answer_confidence": "yes",
                                "answer_id": ai + 1})
            annotations.append({
                "question_id": question_id,
                "image_id": image_id,
                "question_type": "what",
                "answer_type": "other",
                "answers": answers,
                "multiple_choice_answer": main_answer,
            })
        meta = {"data_type": "mscoco", "data_subtype": split}
        with open(os.path.join(
                out_dir, "Questions",
                f"v2_OpenEnded_mscoco_{split}_questions.json"), "w") as f:
            json.dump({**meta, "questions": questions}, f)
        with open(os.path.join(
                out_dir, "Annotations",
                f"v2_mscoco_{split}_annotations.json"), "w") as f:
            json.dump({**meta, "annotations": annotations}, f)


def make_dataset(out_dir: str, num_images: int = 8, num_questions: int = 24,
                 img_size: int = 16, n_answers: int = 16,
                 seed: int = 0) -> Dict[str, str]:
    """Full synthetic dataset: raw jsons -> vocabs -> qst-ans.h5 +
    images.h5 + npy records. Returns paths dict. Images are random uint8
    keyed by image id (deterministic)."""
    import h5py

    from lctvqa.data import preprocess, vocab

    os.makedirs(out_dir, exist_ok=True)
    make_raw_vqa_json(out_dir, num_images, num_questions, seed)
    vocab.make_vocab_questions(os.path.join(out_dir, "Questions"),
                               os.path.join(out_dir, "vocab_questions.txt"))
    vocab.make_vocab_answers(os.path.join(out_dir, "Annotations"),
                             os.path.join(out_dir, "vocab_answers.txt"),
                             n_answers=n_answers)
    vocab.make_vocab_unified(os.path.join(out_dir, "Questions"),
                             os.path.join(out_dir, "Annotations"),
                             os.path.join(out_dir, "vocab_unified.txt"),
                             n_answers=n_answers)
    preprocess.build_qa_h5(out_dir, out_dir)

    # images.h5 straight from random bytes (no jpgs needed)
    rng = np.random.RandomState(seed)
    with h5py.File(os.path.join(out_dir, "images.h5"), "w") as fd:
        for si, split in enumerate(("train", "val")):
            ids = np.arange(1000 * (si + 1),
                            1000 * (si + 1) + num_images, dtype=np.int64)
            imgs = rng.randint(0, 256,
                               (num_images, img_size, img_size, 3),
                               dtype=np.uint8)
            g = fd.create_group(split)
            g.create_dataset("images", data=imgs)
            g.create_dataset("coco_ids", data=ids)

    # npy records (image files don't exist; loaders in tests use h5)
    _build_npy_records(out_dir)
    return {"dir": out_dir}


def _build_npy_records(out_dir: str) -> None:
    from lctvqa.text import VocabDict, tokenize

    ans_vocab = VocabDict(os.path.join(out_dir, "vocab_answers.txt"))
    valid_set = set(ans_vocab.word_list)
    for split, out_name in (("train2014", "train.npy"),
                            ("val2014", "valid.npy")):
        with open(os.path.join(
                out_dir, "Questions",
                f"v2_OpenEnded_mscoco_{split}_questions.json")) as f:
            questions = json.load(f)["questions"]
        with open(os.path.join(
                out_dir, "Annotations",
                f"v2_mscoco_{split}_annotations.json")) as f:
            anns = {a["question_id"]: a
                    for a in json.load(f)["annotations"]}
        coco_set = split
        records = []
        for q in questions:
            name = f"COCO_{coco_set}_{q['image_id']:012d}"
            ann = anns[q["question_id"]]
            all_answers = [a["answer"] for a in ann["answers"]]
            valid = [a for a in all_answers if a in valid_set]
            records.append(dict(
                image_name=name,
                image_path=os.path.join(out_dir, coco_set, name + ".jpg"),
                question_id=q["question_id"],
                question_str=q["question"],
                question_tokens=tokenize(q["question"]),
                all_answers=all_answers,
                valid_answers=valid if valid else ["<unk>"],
            ))
        np.save(os.path.join(out_dir, out_name),
                np.array(records, dtype=object))
