"""Composed FULL-MODEL logits parity vs a PyTorch re-execution.

Round-1 pinned every primitive to torch (test_ops_torch_parity.py) and the
VGG converter (test_vgg_convert.py); this file closes the BASELINE.json
"reference logits to fp32 tolerance" bar as far as this environment allows:
hand-built torch modules replicate `basic_vqa/models.py:91-125` (the W
model) and `basic_vqa/models_lct.py:96-257` (the EF model, fixed-VGG
encoder), weights are converted into our pytrees, and the end-to-end
forward logits AND losses must match.

Small dims (vgg width 1/8, embed 32, vocab 64) keep the single-core run
fast; the math is dimension-independent.
"""

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from lctvqa.config import ModelConfig
from lctvqa.models import vgg, vqa_ef, vqa_w

RTOL, ATOL = 1e-4, 1e-4

WIDTH_MULT = 0.125
FC_DIM = 64
EMBED = 32
WORD_EMBED = 16
HIDDEN = 32  # must equal EMBED for the EF encoder (h0 = image embedding)
QST_VOCAB = 64
ANS_VOCAB = 16
IMG = 32  # VGG19 has five 2x2 maxpools; 32 -> 1 at the trunk output
T = 8


def _np(x):
    return np.asarray(x)


class _TorchVgg19Narrow(nn.Module):
    """VGG19-shaped torch module at width_mult, state_dict-key compatible
    with vgg.convert_torch_state_dict (torchvision absent here)."""

    def __init__(self, width_mult=WIDTH_MULT, fc_dim=FC_DIM):
        super().__init__()
        layers, c_in = [], 3
        for v in vgg.VGG19_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                c_out = max(1, int(v * width_mult))
                layers += [nn.Conv2d(c_in, c_out, 3, padding=1),
                           nn.ReLU(inplace=True)]
                c_in = c_out
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d(7)
        self.classifier = nn.Sequential(
            nn.Linear(c_in * 7 * 7, fc_dim), nn.ReLU(inplace=True),
            nn.Dropout(),
            nn.Linear(fc_dim, fc_dim), nn.ReLU(inplace=True), nn.Dropout())

    def forward(self, x):
        x = self.avgpool(self.features(x))
        return self.classifier(torch.flatten(x, 1))


class _TorchWQstEncoder(nn.Module):
    """basic_vqa/models.py:45-68."""

    def __init__(self):
        super().__init__()
        self.word2vec = nn.Embedding(QST_VOCAB, WORD_EMBED)
        self.lstm = nn.LSTM(WORD_EMBED, HIDDEN, 1)
        self.fc = nn.Linear(2 * HIDDEN, EMBED)

    def forward(self, qst):
        v = torch.tanh(self.word2vec(qst)).transpose(0, 1)
        _, (h, c) = self.lstm(v)
        f = torch.cat((h, c), 2).transpose(0, 1).reshape(qst.size(0), -1)
        return self.fc(torch.tanh(f))


class _TorchWModel(nn.Module):
    """basic_vqa/models.py:71-125 with the frozen-VGG image encoder."""

    def __init__(self):
        super().__init__()
        self.vgg = _TorchVgg19Narrow()
        self.img_fc = nn.Linear(FC_DIM, EMBED)
        self.qst_encoder = _TorchWQstEncoder()
        self.fc1 = nn.Linear(EMBED, ANS_VOCAB)
        self.fc2 = nn.Linear(ANS_VOCAB, ANS_VOCAB)

    def forward(self, img, qst):
        with torch.no_grad():
            feat = self.vgg(img)
        f = self.img_fc(feat)
        f = f / f.norm(p=2, dim=1, keepdim=True).detach()
        q = self.qst_encoder(qst)
        x = torch.tanh(f * q)          # dropout inactive in eval()
        x = torch.tanh(self.fc1(x))
        return self.fc2(x)


class _TorchEfQstEncoder(nn.Module):
    """basic_vqa/models_lct.py:70-170 (teacher-forced fwd + generate)."""

    def __init__(self):
        super().__init__()
        self.word2vec = nn.Embedding(QST_VOCAB, WORD_EMBED)
        self.lstm = nn.LSTM(WORD_EMBED, HIDDEN, 1)
        self.fc1 = nn.Linear(2 * HIDDEN, EMBED)
        self.fc2 = nn.Linear(HIDDEN, QST_VOCAB)

    def forward(self, qst, img_emb):
        h0 = img_emb.view(1, -1, HIDDEN)
        v = torch.tanh(self.word2vec(qst)).transpose(0, 1)
        out, (h, c) = self.lstm(v, (h0, h0))
        f = torch.cat((h, c), 2).transpose(0, 1).reshape(qst.size(0), -1)
        qst_feature = self.fc1(torch.tanh(f))
        qst_out = self.fc2(torch.tanh(out.transpose(0, 1)))
        return qst_feature, qst_out

    def generate(self, img_emb, max_length):
        b = img_emb.size(0)
        state = (img_emb.view(1, -1, HIDDEN),) * 2
        start = torch.full((b, 1), 2, dtype=torch.long)
        cur = torch.tanh(self.word2vec(start)).transpose(0, 1)
        toks = torch.zeros((b, max_length), dtype=torch.long)
        for t in range(max_length):
            out, state = self.lstm(cur, state)
            prob = self.fc2(torch.tanh(out.transpose(0, 1)))
            pred = torch.argmax(prob, 2)
            cur = self.word2vec(pred).transpose(0, 1)  # no tanh (quirk)
            toks[:, t] = pred[:, 0]
        return toks


class _TorchEfModel(nn.Module):
    """basic_vqa/models_lct.py:172-257, fixed-VGG encoder."""

    def __init__(self):
        super().__init__()
        self.vgg = _TorchVgg19Narrow()
        self.img_fc = nn.Linear(FC_DIM, EMBED)
        self.qst_encoder = _TorchEfQstEncoder()
        self.fc1 = nn.Linear(EMBED, ANS_VOCAB)
        self.fc2 = nn.Linear(ANS_VOCAB, ANS_VOCAB)

    def _img(self, img):
        with torch.no_grad():
            feat = self.vgg(img)
        f = self.img_fc(feat)
        return f / f.norm(p=2, dim=1, keepdim=True).detach()

    def _head(self, img_f, qst_f):
        x = torch.tanh(img_f * qst_f)
        x = torch.tanh(self.fc1(x))
        return self.fc2(x)

    def forward(self, img, qst):
        img_f = self._img(img)
        qst_f, qst_out = self.qst_encoder(qst, img_f)
        return self._head(img_f, qst_f), qst_out

    def generate(self, img, max_length):
        img_f = self._img(img)
        qst = self.qst_encoder.generate(img_f, max_length)
        qst_f, _ = self.qst_encoder(qst, img_f)
        return qst, self._head(img_f, qst_f)

    def _loss(self, img, qst, labels):
        ans_out, qst_out = self(img, qst)
        ans_loss = F.cross_entropy(ans_out, labels)
        qst_loss = F.cross_entropy(
            qst_out[:, :-1].flatten(end_dim=1), qst[:, 1:].flatten())
        return ans_loss + qst_loss


# ---------------------------------------------------------------------
# weight conversion: torch module -> our pytrees
# ---------------------------------------------------------------------

def _lin(m: nn.Linear):
    return {"w": jnp.asarray(m.weight.detach().numpy().T),
            "b": jnp.asarray(m.bias.detach().numpy())}


def _lstm(m: nn.LSTM):
    return {"layers": [{
        "w_ih": jnp.asarray(m.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(m.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(m.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(m.bias_hh_l0.detach().numpy()),
    }]}


def _w_params(tm: _TorchWModel):
    return {
        "vgg": vgg.convert_torch_state_dict(tm.vgg.state_dict()),
        "img_fc": _lin(tm.img_fc),
        "qst": {
            "word2vec": {"table": jnp.asarray(
                tm.qst_encoder.word2vec.weight.detach().numpy())},
            "lstm": _lstm(tm.qst_encoder.lstm),
            "fc": _lin(tm.qst_encoder.fc),
        },
        "fc1": _lin(tm.fc1),
        "fc2": _lin(tm.fc2),
    }


def _ef_params(tm: _TorchEfModel):
    return {
        "vgg": vgg.convert_torch_state_dict(tm.vgg.state_dict()),
        "img_fc": _lin(tm.img_fc),
        "qst": {
            "word2vec": {"table": jnp.asarray(
                tm.qst_encoder.word2vec.weight.detach().numpy())},
            "lstm": _lstm(tm.qst_encoder.lstm),
            "fc1": _lin(tm.qst_encoder.fc1),
            "fc2": _lin(tm.qst_encoder.fc2),
        },
        "fc1": _lin(tm.fc1),
        "fc2": _lin(tm.fc2),
    }


def _mcfg(arch_type="fixed"):
    return ModelConfig(
        img_embed_size=EMBED, word_embed_size=WORD_EMBED,
        lstm_hidden_size=HIDDEN, lstm_num_layers=1, max_qst_len=T,
        qst_vocab_size=QST_VOCAB, ans_vocab_size=ANS_VOCAB, img_size=IMG,
        arch_type=arch_type, vgg_width_mult=WIDTH_MULT, vgg_fc_dim=FC_DIM,
        compute_dtype="float32", use_pallas_lstm=False)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    img = rng.randn(3, IMG, IMG, 3).astype(np.float32)
    qst = rng.randint(0, QST_VOCAB, (3, T)).astype(np.int32)
    labels = rng.randint(0, ANS_VOCAB, (3,)).astype(np.int64)
    return img, qst, labels


def test_w_model_end_to_end_logits_and_losses(data):
    """w_forward / w_loss / w_soft_loss vs basic_vqa/models.py:91-125."""
    img, qst, labels = data
    torch.manual_seed(0)
    tm = _TorchWModel().eval()
    params = _w_params(tm)
    cfg = _mcfg()

    t_img = torch.tensor(img).permute(0, 3, 1, 2)
    t_qst = torch.tensor(qst.astype(np.int64))
    with torch.no_grad():
        want = tm(t_img, t_qst).numpy()
    got = _np(vqa_w.w_forward(params, cfg, jnp.asarray(img),
                              jnp.asarray(qst), deterministic=True))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    # _loss (models.py:113-116)
    with torch.no_grad():
        want_loss = float(F.cross_entropy(tm(t_img, t_qst),
                                          torch.tensor(labels)))
    got_loss = float(vqa_w.w_loss(params, cfg, jnp.asarray(img),
                                  jnp.asarray(qst), jnp.asarray(labels)))
    np.testing.assert_allclose(got_loss, want_loss, rtol=RTOL)

    # _soft_loss (models.py:118-125): real CE + W_LAMBDA * softXEnt(pseudo)
    rng = np.random.RandomState(1)
    pseudo_qst = rng.randint(0, QST_VOCAB, (3, T)).astype(np.int32)
    pseudo_ans = rng.rand(3, ANS_VOCAB).astype(np.float32)
    pseudo_ans /= pseudo_ans.sum(1, keepdims=True)
    w_lambda = 0.7
    with torch.no_grad():
        out1 = tm(t_img, t_qst)
        out2 = tm(t_img, torch.tensor(pseudo_qst.astype(np.int64)))
        logprobs = F.log_softmax(out2, dim=1)
        soft = -(torch.tensor(pseudo_ans) * logprobs).sum() / out2.shape[0]
        want_soft = float(F.cross_entropy(out1, torch.tensor(labels))
                          + w_lambda * soft)
    got_soft = float(vqa_w.w_soft_loss(
        params, cfg, jnp.asarray(img), jnp.asarray(qst),
        jnp.asarray(labels), jnp.asarray(pseudo_qst),
        jnp.asarray(pseudo_ans), w_lambda))
    np.testing.assert_allclose(got_soft, want_soft, rtol=RTOL)


def test_ef_model_end_to_end_logits_loss_generate(data):
    """ef_forward / ef_loss / ef_generate vs models_lct.py:200-257."""
    img, qst, labels = data
    torch.manual_seed(1)
    tm = _TorchEfModel().eval()
    params = _ef_params(tm)
    cfg = _mcfg()

    t_img = torch.tensor(img).permute(0, 3, 1, 2)
    t_qst = torch.tensor(qst.astype(np.int64))
    with torch.no_grad():
        want_ans, want_qst = tm(t_img, t_qst)
    got_ans, got_qst = vqa_ef.ef_forward(params, None, cfg,
                                         jnp.asarray(img), jnp.asarray(qst),
                                         deterministic=True)
    np.testing.assert_allclose(_np(got_ans), want_ans.numpy(),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(_np(got_qst), want_qst.numpy(),
                               rtol=RTOL, atol=ATOL)

    # _loss: ans CE + shifted teacher-forcing qst CE (models_lct.py:250-257)
    with torch.no_grad():
        want_loss = float(tm._loss(t_img, t_qst, torch.tensor(labels)))
    got_loss = float(vqa_ef.ef_loss(params, None, cfg, jnp.asarray(img),
                                    jnp.asarray(qst), jnp.asarray(labels)))
    np.testing.assert_allclose(got_loss, want_loss, rtol=RTOL)

    # greedy generate: identical argmax chain + identical answer logits
    # (models_lct.py:220-241). Random weights give argmax gaps far above
    # fp32 noise, so token-exact equality is expected.
    with torch.no_grad():
        want_toks, want_gen_ans = tm.generate(t_img, T)
    got_toks, got_gen_ans = vqa_ef.ef_generate(
        params, None, cfg, jnp.asarray(img), deterministic=True,
        sample_deterministic=True)
    np.testing.assert_array_equal(_np(got_toks), want_toks.numpy())
    np.testing.assert_allclose(_np(got_gen_ans), want_gen_ans.numpy(),
                               rtol=RTOL, atol=ATOL)


def test_ef_generate_pallas_kernel_vs_torch(data, monkeypatch):
    """The whole-loop fused decode kernel (interpret mode) reproduces the
    torch argmax chain token-exactly — pins kernel == torch directly, not
    just via the kernel == scan and scan == torch legs."""
    import dataclasses

    from lctvqa.ops import pallas_generate as PG

    img, qst, labels = data
    torch.manual_seed(1)
    tm = _TorchEfModel().eval()
    params = _ef_params(tm)
    cfg = dataclasses.replace(_mcfg(), pallas_generate=True)

    with torch.no_grad():
        want_toks, want_gen_ans = tm.generate(torch.tensor(img).permute(
            0, 3, 1, 2), T)

    monkeypatch.setattr(PG, "PALLAS_GEN_INTERPRET", True)
    got_toks, got_gen_ans = vqa_ef.ef_generate(
        params, None, cfg, jnp.asarray(img), deterministic=True,
        sample_deterministic=True)
    np.testing.assert_array_equal(_np(got_toks), want_toks.numpy())
    np.testing.assert_allclose(_np(got_gen_ans), want_gen_ans.numpy(),
                               rtol=RTOL, atol=ATOL)
