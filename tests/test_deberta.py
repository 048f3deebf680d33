"""DeBERTa-v2 encoder + HF converter parity (the TPU-native NLI path).

The converter must reproduce ``transformers.DebertaV2ForSequenceClassification``
logits on the same (padded, masked) inputs — this is what makes
``microsoft/deberta-v2-xxlarge-mnli`` (the reference's semantic-entropy
entailment model, reference llm_uncertainty/scores.py:429-436) runnable on
the JAX backend. Tiny random-init HF models keep the tests hermetic; the
primary config mirrors the xxlarge-mnli STRUCTURE (share_att_key, p2c+c2p,
log position buckets, layer_norm'd rel embeddings, post-layer-0 conv,
no absolute positions), the secondary config flips every one of those
switches."""

import numpy as np
import pytest

import jax.numpy as jnp

from runia_core_tpu.models import convert_hf_deberta, wrap_jax_nli

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def tiny_hf_deberta(**over):
    """Structure of deberta-v2-xxlarge-mnli at toy width."""
    kw = dict(
        vocab_size=97,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        relative_attention=True,
        position_buckets=8,
        norm_rel_ebd="layer_norm",
        share_att_key=True,
        pos_att_type="p2c|c2p",
        position_biased_input=False,
        conv_kernel_size=3,
        conv_act="gelu",
        type_vocab_size=0,
        num_labels=3,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pooler_dropout=0.0,
    )
    kw.update(over)
    cfg = transformers.DebertaV2Config(**kw)
    torch.manual_seed(0)
    return transformers.DebertaV2ForSequenceClassification(cfg).eval()


def _inputs(rng, n=3, t=12, pad=True, vocab=97):
    ids = rng.randint(3, vocab, (n, t))
    mask = np.ones((n, t), np.int64)
    if pad:
        for i in range(n):  # ragged right padding
            mask[i, t - i * 2:] = 0
            ids[i, t - i * 2:] = 0
    return ids, mask


@pytest.fixture(scope="module")
def converted():
    hf = tiny_hf_deberta()
    model, params = convert_hf_deberta(hf)
    return hf, model, params


class TestHFParity:
    def test_logits_match_torch_padded(self, converted):
        hf, model, params = converted
        ids, mask = _inputs(np.random.RandomState(0))
        with torch.no_grad():
            want = hf(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
            ).logits.numpy()
        got = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)

    def test_long_sequence_hits_log_buckets(self, converted):
        # t=24 with buckets=8: |rel| beyond mid=4 exercises the log map.
        hf, model, params = converted
        ids, mask = _inputs(np.random.RandomState(1), n=2, t=24)
        with torch.no_grad():
            want = hf(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
            ).logits.numpy()
        got = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=1e-4)

    def test_alternate_config_parity(self):
        # Flip every structural switch: dedicated pos projections, absolute
        # position embeddings, token types, no conv, un-normed rel table,
        # c2p only, no bucketing (raw relative positions), embed_proj.
        hf = tiny_hf_deberta(
            share_att_key=False,
            position_biased_input=True,
            type_vocab_size=2,
            conv_kernel_size=0,
            norm_rel_ebd="none",
            pos_att_type="c2p",
            position_buckets=-1,
            max_relative_positions=16,
            embedding_size=24,
        )
        model, params = convert_hf_deberta(hf)
        rng = np.random.RandomState(2)
        ids, mask = _inputs(rng)
        tt = rng.randint(0, 2, ids.shape)
        with torch.no_grad():
            want = hf(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
                token_type_ids=torch.tensor(tt),
            ).logits.numpy()
        got = model.apply(
            params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)

    def test_no_relative_attention(self):
        hf = tiny_hf_deberta(
            relative_attention=False, position_buckets=-1,
            position_biased_input=True, conv_kernel_size=0,
            norm_rel_ebd="none", pos_att_type=None,
        )
        model, params = convert_hf_deberta(hf)
        ids, mask = _inputs(np.random.RandomState(3), n=2, t=10)
        with torch.no_grad():
            want = hf(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
            ).logits.numpy()
        got = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)

    def test_padding_invariance(self, converted):
        # Extra right padding must not change logits (mask semantics).
        _, model, params = converted
        ids, mask = _inputs(np.random.RandomState(4), n=2, t=10, pad=False)
        short = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        ids_p = np.concatenate([ids, np.zeros((2, 6), np.int64)], axis=1)
        mask_p = np.concatenate([mask, np.zeros((2, 6), np.int64)], axis=1)
        long = model.apply(params, jnp.asarray(ids_p), jnp.asarray(mask_p))
        np.testing.assert_allclose(
            np.asarray(short), np.asarray(long), atol=2e-5, rtol=1e-5
        )


class _TinyPairTokenizer:
    """Host-side HF-like pair tokenizer over a toy word vocabulary: enough
    of the HF tokenizer surface for wrap_jax_nli (padding, truncation,
    numpy tensors, token_type_ids)."""

    def __init__(self, vocab=97):
        self.vocab = vocab

    def _encode(self, text):
        import zlib

        return [
            3 + (zlib.crc32(w.encode()) % (self.vocab - 3))
            for w in text.split()
        ]

    def __call__(self, premises, hypotheses, padding=True, truncation=True,
                 max_length=None, return_tensors="np"):
        rows, types = [], []
        for p, h in zip(premises, hypotheses):
            a, b_ = self._encode(p), self._encode(h)
            row = [1] + a + [2] + b_ + [2]  # [CLS] a [SEP] b [SEP]
            tt = [0] * (len(a) + 2) + [1] * (len(b_) + 1)
            if max_length and truncation:
                row, tt = row[:max_length], tt[:max_length]
            rows.append(row)
            types.append(tt)
        width = max(len(r) for r in rows)
        n = len(rows)
        ids = np.zeros((n, width), np.int64)
        mask = np.zeros((n, width), np.int64)
        tts = np.zeros((n, width), np.int64)
        for i, (r, tt) in enumerate(zip(rows, types)):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
            tts[i, : len(tt)] = tt
        return {"input_ids": ids, "attention_mask": mask,
                "token_type_ids": tts}


class TestJaxNLI:
    def test_batch_labels_match_torch(self, converted):
        hf, model, params = converted
        tok = _TinyPairTokenizer()
        labels_fn = wrap_jax_nli(model, params, tok, max_len=32,
                                 len_buckets=(16, 32), batch_bucket=4)
        assert labels_fn.is_batch_labels
        prem = ["the cat sat", "a dog ran far", "sun is hot"]
        hyp = ["a cat was sitting", "the dog slept", "sun is hot today"]
        got = labels_fn(prem, hyp)
        enc = tok(prem, hyp, max_length=32)
        with torch.no_grad():
            want = (
                hf(
                    input_ids=torch.tensor(enc["input_ids"]),
                    attention_mask=torch.tensor(enc["attention_mask"]),
                    token_type_ids=torch.tensor(enc["token_type_ids"]),
                )
                .logits.numpy()
                .argmax(1)
            )
        np.testing.assert_array_equal(got, want)

    def test_semantic_entropy_on_jax_backend(self, converted):
        # End-to-end: semantic_entropy routes the marked batched callable
        # through the batched clustering — zero torch calls in the loop.
        from runia_core_tpu.llm.scores import semantic_entropy
        from runia_core_tpu.llm.utils import (
            _semantic_clustering_batched,
            make_nli_batch_labels,
        )

        hf, model, params = converted
        tok = _TinyPairTokenizer()
        labels_fn = wrap_jax_nli(model, params, tok, max_len=32,
                                 len_buckets=(16, 32), batch_bucket=4)
        texts = ["the cat sat", "a cat was sitting", "rain fell hard",
                 "the dog slept"]
        ent, clusters = semantic_entropy(labels_fn, None, texts)
        # Oracle: the torch batched path on the same tiny model/tokenizer.
        want = _semantic_clustering_batched(
            make_nli_batch_labels(hf, _PtPairTokenizer(tok)), None, texts
        )
        got_sets = sorted(tuple(v) for v in clusters.values())
        want_sets = sorted(tuple(v) for v in want.values())
        assert got_sets == want_sets
        assert np.isfinite(ent)


class _PtPairTokenizer:
    """Adapter: the numpy toy tokenizer re-emitting torch tensors (what
    make_nli_batch_labels' torch path expects)."""

    def __init__(self, np_tok):
        self.np_tok = np_tok

    def __call__(self, premises, hypotheses, return_tensors="pt",
                 padding=True, truncation=True):
        enc = self.np_tok(premises, hypotheses, max_length=None)
        return {k: torch.tensor(v) for k, v in enc.items()}
