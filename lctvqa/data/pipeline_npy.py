"""v1 (npy-record) dataset path + the unified qa-stream dataset.

Semantics: `basic_vqa/data_loader.py:10-61` (question encoded as
<start> tokens <end> padded to max_qst_length, random valid answer,
-1-padded multi-choice) and `darts_vqa/data_loader.py:82-125` (single
`<start> q <sep> a <end>` stream over the unified vocab).

Images come from JPEG files named by `image_path` when they exist, else
from images.h5 keyed by coco id (our synthetic fixtures ship h5 only).
Batches are assembled as numpy and normalized on device (see pipeline.py).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Iterator

import numpy as np

from lctvqa.text import VocabDict

_ID_RE = re.compile(r"_(\d{12})$")


class VqaNpyDataset:
    """Question/answer view over the npy records."""

    def __init__(self, input_dir: str, input_vqa: str,
                 max_qst_length: int = 30, max_num_ans: int = 10,
                 img_size: int = 64, train_portion: float = 1.0):
        self.input_dir = input_dir
        self.vqa = np.load(os.path.join(input_dir, input_vqa),
                           allow_pickle=True)
        self.qst_vocab = VocabDict(
            os.path.join(input_dir, "vocab_questions.txt"))
        self.ans_vocab = VocabDict(
            os.path.join(input_dir, "vocab_answers.txt"))
        self.max_qst_length = max_qst_length
        self.max_num_ans = max_num_ans
        self.img_size = img_size
        self.load_ans = ("valid_answers" in self.vqa[0]
                         and self.vqa[0]["valid_answers"] is not None)
        self._h5_images = None  # lazy h5 fallback
        self._h5_ids = None
        self._vec = None        # vectorized batch-assembly cache
        # Subset(train_portion) equivalent (basic_vqa/data_loader.py:87-93)
        self.num_qst = int(np.floor(train_portion * len(self.vqa)))

    def __len__(self):
        return self.num_qst

    def image_names(self, idx: np.ndarray):
        return [self.vqa[int(i)]["image_name"] for i in idx]

    # ---------------- images ----------------
    def _load_h5(self):
        import h5py
        if self._h5_images is None:
            self._h5_images = {}
            self._h5_ids = {}
            with h5py.File(os.path.join(self.input_dir, "images.h5"),
                           "r") as fd:
                for split in fd.keys():
                    self._h5_images[split] = fd[f"{split}/images"][()]
                    ids = fd[f"{split}/coco_ids"][()]
                    self._h5_ids[split] = {int(c): i
                                           for i, c in enumerate(ids)}

    def _image(self, rec) -> np.ndarray:
        path = rec["image_path"]
        if os.path.exists(path):
            from PIL import Image
            img = Image.open(path).convert("RGB")
            return np.asarray(img.resize((self.img_size, self.img_size)),
                              dtype=np.uint8)
        if self._vec is not None:
            coco_id = int(_ID_RE.search(rec["image_name"]).group(1))
            split = "train" if "train" in rec["image_name"] else "val"
            row = (self._vec["offsets"][split]
                   + self._vec["ids"][split][coco_id])
            return self._vec["imgs"][row]
        self._load_h5()
        coco_id = int(_ID_RE.search(rec["image_name"]).group(1))
        split = "train" if "train" in rec["image_name"] else "val"
        return self._h5_images[split][self._h5_ids[split][coco_id]]

    # ---------------- encoding ----------------
    def encode_question(self, rec) -> np.ndarray:
        q = np.full(self.max_qst_length, self.qst_vocab.word2idx("<pad>"),
                    np.int32)
        # truncate to fit <start> ... <end> (the reference would index out
        # of bounds here; VQA questions always fit its width of 30)
        toks = rec["question_tokens"][: self.max_qst_length - 2]
        q[0] = self.qst_vocab.word2idx("<start>")
        q[1:len(toks) + 1] = [self.qst_vocab.word2idx(w) for w in toks]
        q[len(toks) + 1] = self.qst_vocab.word2idx("<end>")
        return q

    def item(self, idx: int, rng: np.random.Generator) -> Dict:
        rec = self.vqa[idx]
        sample = {
            "image_u8": self._image(rec),
            "question": self.encode_question(rec),
            "image_name": rec["image_name"],
        }
        if self.load_ans:
            ans_ids = [self.ans_vocab.word2idx(w)
                       for w in rec["valid_answers"]]
            sample["answer_label"] = np.int32(
                ans_ids[rng.integers(len(ans_ids))])
            mc = np.full(self.max_num_ans, -1, np.int32)
            mc[:len(ans_ids)] = ans_ids[:self.max_num_ans]
            sample["answer_multi_choice"] = mc
        return sample

    # ---------------- vectorized batch assembly ----------------
    def _vectorizable(self) -> bool:
        """Whole-array assembly needs every image to come from images.h5;
        when real JPEG files exist on disk (the reference's v1 layout) the
        per-item PIL path is kept (it matches the reference's DataLoader
        worker behavior and JPEG decode cannot be numpy-vectorized)."""
        return not os.path.exists(self.vqa[0]["image_path"])

    def _build_vec(self):
        """One-time cache turning per-item Python assembly into numpy
        fancy-indexing: encoded questions [n, L], a single combined image
        table + per-record row, and the padded valid-answer-id table
        (round-2 verdict #7: the darts/unified family fed through a
        per-item Python loader)."""
        if self._vec is not None:
            return
        self._load_h5()
        n = len(self.vqa)
        q = np.stack([self.encode_question(rec) for rec in self.vqa])
        splits = sorted(self._h5_images)
        offsets, parts, off = {}, [], 0
        for s in splits:
            offsets[s] = off
            parts.append(self._h5_images[s])
            off += len(self._h5_images[s])
        imgs = parts[0] if len(parts) == 1 else np.concatenate(parts)
        rows = np.empty(n, np.int64)
        names = []
        for i, rec in enumerate(self.vqa):
            split = "train" if "train" in rec["image_name"] else "val"
            coco_id = int(_ID_RE.search(rec["image_name"]).group(1))
            rows[i] = offsets[split] + self._h5_ids[split][coco_id]
            names.append(rec["image_name"])
        ans_w = counts = None
        if self.load_ans:
            max_c = max(self.max_num_ans,
                        max(len(r["valid_answers"]) for r in self.vqa))
            ans_w = np.full((n, max_c), -1, np.int32)
            counts = np.empty(n, np.int64)
            for i, rec in enumerate(self.vqa):
                ids = [self.ans_vocab.word2idx(w)
                       for w in rec["valid_answers"]]
                counts[i] = len(ids)
                ans_w[i, :len(ids)] = ids
        ids = self._h5_ids
        # free the per-split image copies (the combined table replaces
        # them); the tiny id maps move into the cache for _image()
        self._h5_images = self._h5_ids = None
        self._vec = dict(q=q, imgs=imgs, rows=rows, names=names,
                         ans_w=ans_w, counts=counts, offsets=offsets,
                         ids=ids)

    def batch_from_indices(self, idx: np.ndarray,
                           rng: np.random.Generator) -> dict:
        self._build_vec()
        v = self._vec
        batch = {
            "image_u8": v["imgs"][v["rows"][idx]],
            "question": v["q"][idx],
            "image_name": [v["names"][int(i)] for i in idx],
            "index": idx.astype(np.int32),
        }
        if self.load_ans:
            choice = rng.integers(0, v["counts"][idx])
            batch["answer_label"] = \
                v["ans_w"][idx, choice].astype(np.int32)
            batch["answer_multi_choice"] = \
                v["ans_w"][idx, :self.max_num_ans]
        return batch

    def batches(self, batch_size: int, rng: np.random.Generator,
                shuffle: bool = True,
                drop_remainder: bool = True) -> Iterator[dict]:
        idx = np.arange(len(self))
        if shuffle:
            rng.shuffle(idx)
        n_full = len(idx) // batch_size
        end = n_full * batch_size if drop_remainder else len(idx)
        vec = self._vectorizable()
        for s in range(0, end, batch_size):
            sel = idx[s:s + batch_size]
            if vec:
                yield self.batch_from_indices(sel, rng)
                continue
            items = [self.item(int(i), rng) for i in sel]
            batch = {k: np.stack([it[k] for it in items])
                     if isinstance(items[0][k], np.ndarray)
                     or np.isscalar(items[0][k])
                     or isinstance(items[0][k], np.integer)
                     else [it[k] for it in items]
                     for k in items[0]}
            batch["index"] = sel.astype(np.int32)
            yield batch


class VqaNpyDatasetUnified(VqaNpyDataset):
    """`<start> q <sep> a <end>` stream over vocab_unified.txt
    (darts_vqa/data_loader.py:82-125)."""

    def _vectorizable(self) -> bool:
        # the random answer choice changes the qa stream's LAYOUT (answer
        # words are inline), so assembly stays per-item here
        return False

    def __init__(self, input_dir: str, input_vqa: str,
                 max_qst_length: int = 30, max_num_ans: int = 10,
                 img_size: int = 64, train_portion: float = 1.0):
        super().__init__(input_dir, input_vqa, max_qst_length, max_num_ans,
                         img_size, train_portion)
        self.unified_vocab = VocabDict(
            os.path.join(input_dir, "vocab_unified.txt"))

    def item(self, idx: int, rng: np.random.Generator) -> Dict:
        rec = self.vqa[idx]
        v = self.unified_vocab
        qa = np.full(self.max_qst_length, v.word2idx("<pad>"), np.int32)
        ans = rec["valid_answers"][rng.integers(
            len(rec["valid_answers"]))].split()
        # truncate question so <start> q <sep> a <end> always fits
        max_q = self.max_qst_length - 3 - len(ans)
        toks = rec["question_tokens"][:max(max_q, 0)]
        qlen = len(toks)
        qa[0] = v.word2idx("<start>")
        qa[1:qlen + 1] = [v.word2idx(w) for w in toks]
        qa[qlen + 1] = v.word2idx("<sep>")
        ptr = qlen + 2
        qa[ptr:ptr + len(ans)] = [v.word2idx(w) for w in ans]
        qa[ptr + len(ans)] = v.word2idx("<end>")
        return {
            "image_u8": self._image(rec),
            "qa_str": qa,
            "image_name": rec["image_name"],
        }


def get_npy_loader(input_dir: str, max_qst_length: int = 30,
                   max_num_ans: int = 10, img_size: int = 64,
                   unified: bool = False,
                   train_portion: float = 1.0) -> Dict[str, VqaNpyDataset]:
    cls = VqaNpyDatasetUnified if unified else VqaNpyDataset
    return {
        "train": cls(input_dir, "train.npy", max_qst_length, max_num_ans,
                     img_size, train_portion),
        "valid": cls(input_dir, "valid.npy", max_qst_length, max_num_ans,
                     img_size),
    }
