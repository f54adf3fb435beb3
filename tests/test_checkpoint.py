"""Checkpoint conversion parity + Orbax save/restore round-trip.

The parity test builds an independent torch "golden" model that follows the
reference forward semantics and PARAMETER NAMING (`transformer.py:610-968`),
converts its state dict with `convert_reference_state_dict`, and asserts the
JAX model reproduces its activations on the joint [img; text] forward and the
ITM/word heads — the checkpoint-compatibility anchor (SURVEY.md §7 hard parts).
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from m3p_tpu.checkpoint import (
    average_checkpoints, convert_reference_state_dict,
    export_reference_state_dict, load_reference_checkpoint, merge_params,
    restore_checkpoint, save_checkpoint, save_reference_checkpoint)
from m3p_tpu.config import small_test_config
from m3p_tpu.model import build_model

DIM, HEADS, LAYERS, VOCAB, NPOS = 64, 4, 2, 512, 514
REFINE, NOBJ = 1, 1600


def _gelu_erf(x):
    """The reference gelu (`transformer.py:48-56`)."""
    return 0.5 * x * (1.0 + torch.erf(x / math.sqrt(2.0)))


class GoldenM3P(nn.Module):
    """Reference-semantics torch model with reference parameter names.

    Covers EVERY module `convert_reference_state_dict` maps: the joint
    encoder + ITM/word heads, the decoder path (`encoder_attn`/`layer_norm15`,
    `transformer.py:1087-1106`), lang embeddings, the AoA refiner
    (`transformer.py:274-422`), and the CLCM/MRFR/obj heads
    (`transformer.py:562-606,715-721`)."""

    def __init__(self):
        super().__init__()
        self.embeddings = nn.Embedding(VOCAB, DIM, padding_idx=1)
        self.position_embeddings = nn.Embedding(NPOS, DIM)
        self.cross_lang_embeddings = nn.Embedding(3, DIM)
        self.layer_norm_emb = nn.LayerNorm(DIM, eps=1e-12)

        class ImageEmb(nn.Module):
            def __init__(self):
                super().__init__()
                self.image_embeddings = nn.Linear(2048, DIM)
                self.image_location_embeddings = nn.Linear(5, DIM)
                self.image_distbution_embeddings = nn.Linear(1600, DIM)
                self.LayerNorm = nn.LayerNorm(DIM, eps=1e-12)

            def forward(self, feats, locs):
                x = self.image_embeddings(feats) \
                    + self.image_location_embeddings(locs)
                return self.LayerNorm(x)

        self.image_embeddings = ImageEmb()

        class MHA(nn.Module):
            """Reference MultiHeadAttention semantics (`transformer.py:
            127-210`): self-attention, or cross-attention over ``kv``;
            ``mask`` is (bs, klen) or (bs, qlen, klen) (causal)."""

            def __init__(self):
                super().__init__()
                self.q_lin = nn.Linear(DIM, DIM)
                self.k_lin = nn.Linear(DIM, DIM)
                self.v_lin = nn.Linear(DIM, DIM)
                self.out_lin = nn.Linear(DIM, DIM)

            def forward(self, x, mask, kv=None):
                b = x.shape[0]
                dh = DIM // HEADS
                src = x if kv is None else kv
                klen = src.shape[1]

                def shape(t):
                    return t.view(b, -1, HEADS, dh).transpose(1, 2)

                q = shape(self.q_lin(x)) / math.sqrt(dh)
                k = shape(self.k_lin(src))
                v = shape(self.v_lin(src))
                scores = q @ k.transpose(2, 3)
                neg = -float("inf")
                m = (mask.unsqueeze(1) if mask.dim() == 3
                     else mask.view(b, 1, 1, klen))
                scores = scores.masked_fill(m == 0, neg)
                w = F.softmax(scores.float(), dim=-1).type_as(scores)
                ctx = (w @ v).transpose(1, 2).reshape(b, -1, DIM)
                return self.out_lin(ctx)

        class FFN(nn.Module):
            def __init__(self):
                super().__init__()
                self.lin1 = nn.Linear(DIM, 4 * DIM)
                self.lin2 = nn.Linear(4 * DIM, DIM)

            def forward(self, x):
                h = self.lin1(x)
                h = 0.5 * h * (1.0 + torch.erf(h / math.sqrt(2.0)))
                return self.lin2(h)

        self.attentions = nn.ModuleList([MHA() for _ in range(LAYERS)])
        self.layer_norm1 = nn.ModuleList(
            [nn.LayerNorm(DIM, eps=1e-12) for _ in range(LAYERS)])
        self.ffns = nn.ModuleList([FFN() for _ in range(LAYERS)])
        self.layer_norm2 = nn.ModuleList(
            [nn.LayerNorm(DIM, eps=1e-12) for _ in range(LAYERS)])
        # decoder path (`transformer.py:691-709,1087-1106`)
        self.encoder_attn = nn.ModuleList([MHA() for _ in range(LAYERS)])
        self.layer_norm15 = nn.ModuleList(
            [nn.LayerNorm(DIM, eps=1e-12) for _ in range(LAYERS)])

        # AoA refiner (`AoA_Refiner_Core`, `transformer.py:274-422`):
        # pre-LN sublayers, GLU-gated attention-on-attention
        class AoASelfAttn(nn.Module):
            def __init__(self):
                super().__init__()
                self.linears = nn.ModuleList(
                    [nn.Linear(DIM, DIM) for _ in range(3)])
                self.aoa_layer = nn.Sequential(
                    nn.Linear(2 * DIM, 2 * DIM), nn.GLU())

            def forward(self, q_in, v_in, k_in, mask):
                b = q_in.shape[0]
                dh = DIM // HEADS

                def shape(t):
                    return t.view(b, -1, HEADS, dh).transpose(1, 2)

                q = shape(self.linears[0](q_in))
                k = shape(self.linears[1](k_in))
                v = shape(self.linears[2](v_in))
                scores = q @ k.transpose(-2, -1) / math.sqrt(dh)
                m = mask.unsqueeze(-2).unsqueeze(1)
                scores = scores.masked_fill(m == 0, -float("inf"))
                w = F.softmax(scores, dim=-1)
                x = (w @ v).transpose(1, 2).contiguous().view(b, -1, DIM)
                return self.aoa_layer(torch.cat([x, q_in], -1))

        class Sublayer(nn.Module):
            def __init__(self):
                super().__init__()
                self.norm = nn.LayerNorm(DIM, eps=1e-12)

            def forward(self, x, sub):
                return x + sub(self.norm(x))

        class AoALayer(nn.Module):
            def __init__(self):
                super().__init__()
                self.self_attn = AoASelfAttn()
                self.feed_forward = FFN()
                self.sublayer = nn.ModuleList([Sublayer(), Sublayer()])

            def forward(self, x, mask):
                x = self.sublayer[0](
                    x, lambda t: self.self_attn(t, t, t, mask))
                return self.sublayer[1](x, self.feed_forward)

        class AoACore(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList(
                    [AoALayer() for _ in range(REFINE)])
                self.norm = nn.LayerNorm(DIM, eps=1e-12)

            def forward(self, x, mask):
                for layer in self.layers:
                    x = layer(x, mask)
                return self.norm(x)

        self.refine_embeddings = AoACore()

        class Pooler(nn.Module):
            def __init__(self):
                super().__init__()
                self.dense = nn.Linear(DIM, DIM)

            def forward(self, h):
                return torch.tanh(self.dense(h[:, 0]))

        self.pooled_layer = Pooler()
        self.seq_relationship = nn.Linear(DIM, 1)
        self.pooled_layer2 = Pooler()               # CLCM (`:715-716`)
        self.seq_relationship2 = nn.Linear(DIM, 1)
        self.mrfr_dense = nn.Linear(DIM, 2048)      # MRFR (`:718`)

        # obj head: BertPredictionHeadTransform + 1600-class proj
        # (`transformer.py:562-606,721`)
        class ObjTransform(nn.Module):
            def __init__(self):
                super().__init__()
                self.dense = nn.Linear(DIM, DIM)
                self.LayerNorm = nn.LayerNorm(DIM, eps=1e-12)

            def forward(self, h):
                return self.LayerNorm(_gelu_erf(self.dense(h)))

        class ObjProj(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(DIM, NOBJ)

        self.transformer_obj = ObjTransform()
        self.pred_obj_layer = ObjProj()

        class PredLayer(nn.Module):
            def __init__(self, emb):
                super().__init__()
                self.proj = nn.Linear(DIM, VOCAB)
                self.proj.weight = emb.weight  # tied

        self.pred_layer = PredLayer(self.embeddings)

    def jointfwd(self, x, feats, locs, mask):
        img = self.image_embeddings(feats, locs)
        txt = self.embeddings(x)
        t = torch.cat([img, txt], dim=1)
        s = t.shape[1]
        positions = torch.arange(s).unsqueeze(0)
        t = t + self.position_embeddings(positions)
        t = t * mask.unsqueeze(-1).float()
        t = self.layer_norm_emb(t)
        for i in range(LAYERS):
            attn = self.attentions[i](t, mask)
            t = self.layer_norm1[i](t + attn)
            t = self.layer_norm2[i](t + self.ffns[i](t))
            t = t * mask.unsqueeze(-1).float()
        return t

    def textfwd(self, x, mask, langs=None, causal=False, src_enc=None,
                src_mask=None):
        """crossfwd text stream (`transformer.py:970-1114`), batch-major:
        emb + pos [+ lang] -> LN -> *mask -> per layer self-attn (+LN1),
        optional cross-attn over src_enc (+LN15), FFN (+LN2), *mask."""
        b, s = x.shape
        t = self.embeddings(x)
        positions = torch.arange(s).unsqueeze(0)
        t = t + self.position_embeddings(positions)
        if langs is not None:
            t = t + self.cross_lang_embeddings(langs)
        t = self.layer_norm_emb(t)
        t = t * mask.unsqueeze(-1).float()
        if causal:
            alen = torch.arange(s)
            attn_mask = ((alen[None, None, :] <= alen[None, :, None])
                         & (mask[:, None, :] > 0)).float()
        else:
            attn_mask = mask
        for i in range(LAYERS):
            attn = self.attentions[i](t, attn_mask)
            t = self.layer_norm1[i](t + attn)
            if causal and src_enc is not None:
                c = self.encoder_attn[i](t, src_mask, kv=src_enc)
                t = self.layer_norm15[i](t + c)
            t = self.layer_norm2[i](t + self.ffns[i](t))
            t = t * mask.unsqueeze(-1).float()
        return t

    def itm(self, hidden):
        return self.seq_relationship(self.pooled_layer(hidden))

    def clcm(self, hidden):
        return self.seq_relationship2(self.pooled_layer2(hidden))

    def mrfr(self, hidden):
        return self.mrfr_dense(hidden)

    def obj_scores(self, hidden):
        return self.pred_obj_layer.proj(self.transformer_obj(hidden))

    def refine(self, x, mask):
        return self.refine_embeddings(x, mask)

    def word_scores(self, hidden):
        return self.pred_layer.proj(hidden)


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    golden = GoldenM3P().eval()
    cfg = small_test_config().model
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    sd = {k: v.detach().numpy() for k, v in golden.state_dict().items()}
    loaded = convert_reference_state_dict(sd, n_layers=LAYERS,
                                          refine_layers=1)
    params = merge_params(params, loaded)
    return golden, cfg, model, params


def test_joint_forward_parity(converted):
    golden, cfg, model, params = converted
    rng = np.random.RandomState(0)
    B, S, R = 2, 10, 8
    x = rng.randint(4, VOCAB, (B, S))
    feats = rng.randn(B, R, 2048).astype(np.float32)
    locs = rng.rand(B, R, 5).astype(np.float32)

    with torch.no_grad():
        mask = torch.ones(B, R + S)
        h_t = golden.jointfwd(torch.from_numpy(x), torch.from_numpy(feats),
                              torch.from_numpy(locs), mask)
        itm_t = golden.itm(h_t).numpy()
        w_t = golden.word_scores(h_t[:, R:]).numpy()

    h_j = model.apply({"params": params}, jnp.asarray(x),
                      jnp.ones((B, S), bool), jnp.asarray(feats),
                      jnp.asarray(locs), jnp.ones((B, R), bool),
                      method=model.encode_joint)
    itm_j = model.apply({"params": params}, h_j, method=model.itm_score)
    w_j = model.apply({"params": params}, h_j[:, R:],
                      method=model.word_logits)

    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(itm_j), itm_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(w_j), w_t, atol=2e-3)


def test_parity_with_padding(converted):
    golden, cfg, model, params = converted
    rng = np.random.RandomState(1)
    B, S, R = 2, 8, 4
    x = rng.randint(4, VOCAB, (B, S))
    x[1, 6:] = 1  # pad
    feats = rng.randn(B, R, 2048).astype(np.float32)
    locs = rng.rand(B, R, 5).astype(np.float32)
    np_mask = np.ones((B, R + S), np.float32)
    np_mask[1, R + 6:] = 0

    with torch.no_grad():
        h_t = golden.jointfwd(torch.from_numpy(x), torch.from_numpy(feats),
                              torch.from_numpy(locs),
                              torch.from_numpy(np_mask))

    tmask = jnp.asarray(np_mask[:, R:] > 0)
    h_j = model.apply({"params": params}, jnp.asarray(x), tmask,
                      jnp.asarray(feats), jnp.asarray(locs),
                      jnp.ones((B, R), bool), method=model.encode_joint)
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), atol=2e-4)


def test_decoder_parity_full_and_incremental(converted):
    """Activation parity for the decoder mappings (`encoder_attn.*`,
    `layer_norm15.*`, `cross_lang_embeddings`) and the KV cache: the
    full-sequence causal forward matches torch, and the cached incremental
    decode reproduces the full forward position-by-position
    (`transformer.py:970-1114`, cache `:181-195`)."""
    golden, cfg, model, params = converted
    rng = np.random.RandomState(2)
    B, S, Ss = 2, 7, 5
    x = rng.randint(4, VOCAB, (B, S))
    langs = np.full((B, S), 1, np.int64)
    src_enc = rng.randn(B, Ss, DIM).astype(np.float32)
    src_mask = np.ones((B, Ss), np.float32)
    src_mask[1, 3:] = 0

    with torch.no_grad():
        h_t = golden.textfwd(torch.from_numpy(x), torch.ones(B, S),
                             torch.from_numpy(langs), causal=True,
                             src_enc=torch.from_numpy(src_enc),
                             src_mask=torch.from_numpy(src_mask)).numpy()

    h_j, _ = model.apply({"params": params}, jnp.asarray(x),
                         jnp.ones((B, S), bool), jnp.asarray(langs),
                         None, True, jnp.asarray(src_enc),
                         jnp.asarray(src_mask > 0),
                         method=model.encode_text)
    np.testing.assert_allclose(np.asarray(h_j), h_t, atol=2e-4)

    cache = model.apply({"params": params}, jnp.asarray(src_enc), S,
                        method=model.init_decode_cache)
    outs = []
    for t in range(S):
        step_out, cache = model.apply(
            {"params": params}, jnp.asarray(x[:, t:t + 1]),
            jnp.ones((B, 1), bool), jnp.asarray(langs[:, t:t + 1]),
            jnp.full((B, 1), t, jnp.int32), True, jnp.asarray(src_enc),
            jnp.asarray(src_mask > 0), cache, method=model.encode_text)
        outs.append(np.asarray(step_out)[:, 0])
    np.testing.assert_allclose(np.stack(outs, 1), h_t, atol=2e-4)


def test_greedy_ids_match_torch_decode(converted):
    """Generated ids match a torch step-by-step greedy decode through the
    converted decoder (the strongest cache+head check available without the
    real checkpoint; reference `generate`, `transformer.py:1216-1320`)."""
    from m3p_tpu.model.generation import greedy_generate

    golden, cfg, model, params = converted
    rng = np.random.RandomState(5)
    B, Ss, MAXLEN = 2, 5, 8
    src_enc = rng.randn(B, Ss, DIM).astype(np.float32)
    src_mask = np.ones((B, Ss), np.float32)

    tokens = np.full((B, 1), 2, np.int64)  # EOS-as-BOS start convention
    finished = np.zeros(B, bool)
    with torch.no_grad():
        for _ in range(1, MAXLEN):
            h = golden.textfwd(torch.from_numpy(tokens),
                               torch.ones(B, tokens.shape[1]),
                               torch.from_numpy(np.full_like(tokens, 1)),
                               causal=True,
                               src_enc=torch.from_numpy(src_enc),
                               src_mask=torch.from_numpy(src_mask))
            scores = golden.word_scores(h[:, -1]).numpy()
            nxt = np.where(finished, 1, scores.argmax(-1))  # PAD after EOS
            tokens = np.concatenate([tokens, nxt[:, None]], 1)
            finished |= nxt == 2

    jt, jl = greedy_generate(model, params, jnp.asarray(src_enc),
                             jnp.ones((B, Ss), bool), MAXLEN, tgt_lang_id=1,
                             start_index=2)  # reference EOS-as-BOS decode
    jt = np.asarray(jt)
    for b in range(B):
        upto = min(int(jl[b]), MAXLEN)
        np.testing.assert_array_equal(jt[b, :upto], tokens[b, :upto],
                                      err_msg=f"row {b}")


def test_refiner_parity(converted):
    """AoA refiner activation parity (`refine_embeddings.*` mappings:
    q/k/v linears, GLU aoa gate, pre-LN sublayers, FFN, final norm —
    `transformer.py:274-422`)."""
    golden, cfg, model, params = converted
    rng = np.random.RandomState(3)
    B, R = 2, 6
    x = rng.randn(B, R, DIM).astype(np.float32)
    mask = np.ones((B, R), np.float32)
    mask[1, 4:] = 0

    with torch.no_grad():
        out_t = golden.refine(torch.from_numpy(x),
                              torch.from_numpy(mask)).numpy()

    out_j = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(mask > 0),
        method=lambda m, a, b: m.refiner(a, b, deterministic=True))
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-4)


def test_head_parity_clcm_mrfr_obj(converted):
    """Activation parity for the remaining head mappings: CLCM pooler/score
    (`pooled_layer2`/`seq_relationship2`), MRFR regression (`mrfr_dense`),
    and the obj head transform+proj (`transformer_obj`/`pred_obj_layer`,
    `transformer.py:562-606,715-721`)."""
    golden, cfg, model, params = converted
    rng = np.random.RandomState(4)
    B, S = 2, 9
    hidden = rng.randn(B, S, DIM).astype(np.float32)
    th = torch.from_numpy(hidden)

    with torch.no_grad():
        clcm_t = golden.clcm(th).numpy()
        mrfr_t = golden.mrfr(th).numpy()
        obj_t = golden.obj_scores(th).numpy()

    clcm_j = model.apply({"params": params}, jnp.asarray(hidden),
                         method=model.clcm_score)
    mrfr_j = model.apply({"params": params}, jnp.asarray(hidden),
                         method=model.mrfr_predict)
    obj_j = model.apply({"params": params}, jnp.asarray(hidden),
                        method=model.obj_logits)
    np.testing.assert_allclose(np.asarray(clcm_j), clcm_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mrfr_j), mrfr_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(obj_j), obj_t, atol=2e-3)


def test_average_checkpoints(converted):
    _, _, _, params = converted
    doubled = jax.tree.map(lambda x: 2.0 * x, params)
    avg = average_checkpoints([params, doubled], weights=[0.6, 0.4])
    leaf = params["text_emb"]["word"]["embedding"]
    leaf_avg = avg["text_emb"]["word"]["embedding"]
    np.testing.assert_allclose(np.asarray(leaf_avg),
                               np.asarray(leaf) * 1.4, atol=1e-6)


def test_orbax_roundtrip(tmp_path, converted):
    _, cfg, model, params = converted
    from m3p_tpu.train.optim import build_optimizer
    from m3p_tpu.train.state import create_train_state

    tx, _ = build_optimizer("adam,lr=0.001")
    state = create_train_state(params, tx)
    state = state.replace(step=jnp.array(42, jnp.int32))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, extra={"epoch": 3})
    fresh = create_train_state(jax.tree.map(jnp.zeros_like, params), tx)
    restored, extra = restore_checkpoint(path, fresh)
    assert int(restored.step) == 42
    assert extra["epoch"] == 3
    np.testing.assert_allclose(
        np.asarray(restored.params["text_emb"]["word"]["embedding"]),
        np.asarray(params["text_emb"]["word"]["embedding"]))


def test_grain_mid_epoch_resume(tmp_path):
    """Preemption checkpoint + resume continues the input stream mid-epoch
    WITHOUT repeating or skipping batches (VERDICT item 9): grain iterator
    state rides the Orbax checkpoint."""
    import dataclasses

    from m3p_tpu.config import small_test_config
    from m3p_tpu.data.datasets import RetrievalDataset
    from m3p_tpu.data.features import RegionFeatureStore, write_feature_shard
    from m3p_tpu.model import build_model
    from m3p_tpu.tokenization.tokenizer import XLMRTokenizer
    from m3p_tpu.tokenization.unigram import train_unigram
    from m3p_tpu.train.trainer import Trainer

    rng = np.random.RandomState(0)
    words = ["red", "cat", "dog", "tree", "blue"]
    tok_path = str(tmp_path / "v.tsv")
    train_unigram([" ".join(rng.choice(words, 5)) for _ in range(40)],
                  vocab_size=80).save(tok_path)
    tokenizer = XLMRTokenizer(tok_path)
    n, r = 24, 4
    h5 = str(tmp_path / "f.h5")
    write_feature_shard(
        h5, features=rng.randn(n, r, 2048).astype(np.float32),
        boxes=np.abs(rng.rand(n, r, 4)).astype(np.float32) * 50,
        num_boxes=np.full(n, r, np.int64), wh=np.full((n, 2), 100,
                                                      np.float32),
        image_ids=[f"i{k}" for k in range(n)],
        objects=rng.randint(0, 1600, (n, r)))
    store = RegionFeatureStore(h5, max_region_num=r)
    caps = {i: [" ".join(rng.choice(words, 4))] for i in store.image_ids}

    cfg = small_test_config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, n_words=tokenizer.vocab_size,
                                  mask_index=tokenizer.mask_token_id,
                                  max_region_num=r),
        data=dataclasses.replace(cfg.data, batch_size=2, sample_n=2,
                                 max_len=12, max_region_num=r),
        epoch_size=1000, dump_path=str(tmp_path / "dump"))
    os.makedirs(cfg.dump_path, exist_ok=True)
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))

    def make_trainer():
        ds = RetrievalDataset(caps, store, tokenizer, sample_n=2, max_len=12,
                              seed=cfg.seed)
        return Trainer(cfg, model, jax.tree.map(jnp.array, params),
                       {("rel", "coco"): ds})

    ta = make_trainer()
    task = ("rel", "coco")
    _ = ta._get_batch(task)
    _ = ta._get_batch(task)
    ta.n_sentences = 4  # mid-epoch
    ta.save_checkpoint()
    a3 = ta._get_batch(task)
    a4 = ta._get_batch(task)

    tb = make_trainer()
    assert tb.reload_checkpoint()
    assert tb.epoch == ta.epoch and tb._resume_sentences == 4
    b3 = tb._get_batch(task)
    b4 = tb._get_batch(task)
    for a, b in ((a3, b3), (a4, b4)):
        np.testing.assert_array_equal(np.asarray(a[0]["tokens"]),
                                      np.asarray(b[0]["tokens"]))
        np.testing.assert_array_equal(np.asarray(a[1]["pos_label"]),
                                      np.asarray(b[1]["pos_label"]))
    # and it did not rewind to the start of the epoch
    assert not np.array_equal(np.asarray(a3[0]["tokens"]),
                              np.asarray(b4[0]["tokens"]))


def test_fused_adam_state_checkpoint_roundtrip(tmp_path):
    """FusedAdam's dict opt_state ({mu, nu, master}) survives an Orbax
    save/restore round-trip and training continues bit-identically."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from m3p_tpu import checkpoint as ckpt
    from m3p_tpu.train.optim import build_optimizer
    from m3p_tpu.train.state import create_train_state

    spec = ("adam,lr=0.01,fused=1,mu_dtype=bfloat16,nu_dtype=bfloat16,"
            "master=1")
    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(8, 4), jnp.float32)}
    state = create_train_state(params, build_optimizer(spec)[0])
    g = {"w": jnp.asarray(rng.randn(8, 4), jnp.bfloat16)}
    state = state.apply_gradients(grads=g)

    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, state)
    template = create_train_state(params, build_optimizer(spec)[0])
    restored, _ = ckpt.restore_checkpoint(path, template)
    assert restored.opt_state["master"]["w"].dtype == jnp.float32
    assert restored.params["w"].dtype == jnp.bfloat16

    s1 = state.apply_gradients(grads=g)
    s2 = restored.apply_gradients(grads=g)
    np.testing.assert_array_equal(np.asarray(s1.params["w"], np.float32),
                                  np.asarray(s2.params["w"], np.float32))


def test_weights_only_reload(tmp_path):
    """--reload_model with an Orbax checkpoint dir loads params only into a
    fresh optimizer (the framework-native pretrain -> finetune workflow;
    reference passes the pretrained .pth as --reload_model)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from m3p_tpu import checkpoint as ckpt
    from m3p_tpu.train.state import create_train_state

    rng = np.random.RandomState(0)
    params = {"enc": {"w": jnp.asarray(rng.randn(6, 3), jnp.float32)},
              "head": {"b": jnp.asarray(rng.randn(3), jnp.float32)}}
    state = create_train_state(params, optax.adam(1e-3))
    g = jax.tree.map(jnp.ones_like, params)
    state = state.apply_gradients(grads=g)     # non-trivial opt state + step

    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, state)

    loaded = ckpt.load_params_checkpoint(path)
    for k, sub in (("enc", "w"), ("head", "b")):
        np.testing.assert_array_equal(np.asarray(state.params[k][sub]),
                                      loaded[k][sub])
    # partial-tree overlay: a finetune model with an extra head keeps it
    init = dict(loaded)
    init2 = {"enc": loaded["enc"],
             "head": loaded["head"],
             "new_head": {"w": jnp.zeros((3, 2))}}
    merged = ckpt.merge_params(init2, loaded)
    assert "new_head" in merged
    np.testing.assert_array_equal(np.asarray(merged["enc"]["w"]),
                                  loaded["enc"]["w"])


def test_reference_export_roundtrip(converted):
    """export_reference_state_dict is the exact inverse of
    convert_reference_state_dict: golden torch weights -> convert -> export
    reproduces every golden tensor, and convert(export(params)) == params."""
    golden, cfg, model, params = converted
    sd = export_reference_state_dict(params, n_layers=LAYERS,
                                     refine_layers=1)
    golden_sd = {k: v.detach().numpy() for k, v in golden.state_dict().items()}
    # the 1600-d class-distribution projection is lazily created only when
    # dist inputs are used (optional in the reference too; its reload
    # backfills missing keys, `model/__init__.py:103-105`)
    optional = {k for k in golden_sd if "image_distbution" in k}
    missing = set(golden_sd) - set(sd) - optional
    assert not missing, f"exported dict misses golden keys: {missing}"
    for k, v in golden_sd.items():
        if k in sd:
            np.testing.assert_allclose(sd[k], v, atol=1e-6, err_msg=k)

    back = convert_reference_state_dict(sd, n_layers=LAYERS, refine_layers=1)
    flat_back = jax.tree_util.tree_flatten_with_path(back)[0]
    flat_params = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    for path, leaf in flat_back:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_params[path]),
                                   atol=1e-6, err_msg=str(path))


def test_save_reference_checkpoint_torch_loadable(tmp_path, converted):
    """A checkpoint written by save_reference_checkpoint round-trips through
    torch.load + the import path, and loads into the golden torch model
    (the reference `--reload_model` contract, `model/__init__.py:96-124`)."""
    golden, cfg, model, params = converted
    path = str(tmp_path / "exported.pth")
    save_reference_checkpoint(path, params, n_layers=LAYERS, refine_layers=1,
                              extra_params={"emb_dim": DIM})
    blob = torch.load(path, map_location="cpu", weights_only=False)
    assert blob["params"]["emb_dim"] == DIM

    fresh = GoldenM3P().eval()
    own = fresh.state_dict()
    result = fresh.load_state_dict(
        {k: v for k, v in blob["model"].items() if k in own}, strict=False)
    # only the lazily-created class-distribution projection may be absent
    assert all("image_distbution" in k for k in result.missing_keys)
    assert not result.unexpected_keys

    reloaded = load_reference_checkpoint(path, n_layers=LAYERS,
                                         refine_layers=1)
    merged = merge_params(build_model(cfg, jax.random.PRNGKey(1))[1],
                          reloaded)
    np.testing.assert_allclose(
        np.asarray(merged["text_emb"]["word"]["embedding"]),
        np.asarray(params["text_emb"]["word"]["embedding"]), atol=1e-6)

    # activation equality through the RELOADED torch golden — validates
    # export *semantics* (transposes, naming), not just round-trip identity
    rng = np.random.RandomState(7)
    B, S, R = 2, 6, 4
    x = rng.randint(4, VOCAB, (B, S))
    feats = rng.randn(B, R, 2048).astype(np.float32)
    locs = rng.rand(B, R, 5).astype(np.float32)
    with torch.no_grad():
        h_fresh = fresh.jointfwd(torch.from_numpy(x),
                                 torch.from_numpy(feats),
                                 torch.from_numpy(locs),
                                 torch.ones(B, R + S))
    h_j = model.apply({"params": params}, jnp.asarray(x),
                      jnp.ones((B, S), bool), jnp.asarray(feats),
                      jnp.asarray(locs), jnp.ones((B, R), bool),
                      method=model.encode_joint)
    np.testing.assert_allclose(np.asarray(h_j), h_fresh.numpy(), atol=2e-4)
