"""Optional-dependency integration tests for the REAL model paths
(M1/M2/F5) — the only execution paths the default suite cannot reach
because torch/transformers are absent from this container by design
(SURVEY.md §7.6; VERDICT r6 gap 1).

Every test here skip-marks cleanly when the deps (or the HF hub) are
unavailable and, when they ARE present, asserts the SAME contracts the
fake-scheme tests pin — 2-field struct output, per-executor model
cache, batch-shaped Arrow transfer — against the reference semantics:

- M1 ``transformer_classifier`` mirrors ``Torch_model.apply_model``
  (reference dx_group.py:236-258): Series in → [predicted_label,
  model_score] out, model loaded once per worker.
- M2 ``qa_sectionizer`` mirrors ``answerquestion`` per row × section
  (reference prostate_dag.py:103-124), one Arrow crossing per batch.
- F5 ``truncate_text_tokens`` mirrors the offset-mapping truncation
  (reference dx_group.py:49-61): last 510 tokens for 'entire report',
  first 510 otherwise, cut on token boundaries.

Tiny hf-internal-testing checkpoints keep the download in the
single-digit MB range; any load failure (offline sandbox) skips.
"""

from __future__ import annotations

import pytest

transformers = pytest.importorskip(
    "transformers", reason="real-model path needs transformers"
)
pytest.importorskip("torch", reason="real-model path needs torch")

TINY_CLS = "hf-internal-testing/tiny-random-DistilBertForSequenceClassification"
TINY_QA = "hf-internal-testing/tiny-random-DistilBertForQuestionAnswering"


def _skip_if_unloadable(loader):
    try:
        return loader()
    except Exception as exc:  # offline / hub unreachable: skip, not fail
        pytest.skip(f"model checkpoint unavailable: {exc}")


class TestRealTransformerClassifier:
    def test_real_model_output_contract(self, spark):
        from dataengineer_spark.ml.inference import transformer_classifier

        _skip_if_unloadable(
            lambda: transformers.AutoTokenizer.from_pretrained(TINY_CLS)
        )
        df = spark.createDataFrame(
            [("adenocarcinoma of the prostate",), ("benign finding",), (None,)],
            ["text"],
        )
        pred = transformer_classifier(TINY_CLS, TINY_CLS, num_labels=2)
        out = df.select(pred("text").alias("p")).select("p.*").collect()
        # the Torch_model.apply_model contract: 2 fields, every row
        # (NULL text inferred as "" — never dropped), score in [0, 1]
        assert len(out) == 3
        for r in out:
            assert isinstance(r["predicted_label"], str)
            assert 0.0 <= r["model_score"] <= 1.0

    def test_model_cached_per_process(self, spark):
        from dataengineer_spark.ml import inference

        _skip_if_unloadable(
            lambda: transformers.AutoTokenizer.from_pretrained(TINY_CLS)
        )
        # driver-side probe of the same cache the executors use: two
        # loads must return the SAME pipeline object (load-once contract)
        a = inference._load_torch_model(TINY_CLS, TINY_CLS, 2)
        b = inference._load_torch_model(TINY_CLS, TINY_CLS, 2)
        assert a is b


class TestRealQASectionizer:
    def test_real_qa_answers_all_sections_per_batch(self, spark):
        from dataengineer_spark.ml.inference import qa_sectionizer

        _skip_if_unloadable(
            lambda: transformers.AutoTokenizer.from_pretrained(TINY_QA)
        )
        df = spark.createDataFrame(
            [("The diagnosis is carcinoma. The margin is clear.",), (None,)],
            ["text"],
        )
        qa = qa_sectionizer(
            TINY_QA,
            TINY_QA,
            {"diagnosis": "What is the diagnosis?", "margin": "What is the margin?"},
        )
        out = df.select(qa("text").alias("s")).select("s.*").collect()
        # one struct field per section; NULL text → NULL answers
        assert set(out[0].asDict()) == {"diagnosis", "margin"}
        assert out[1]["diagnosis"] is None and out[1]["margin"] is None
        # a random-weight model still returns a (possibly empty) string
        assert out[0]["diagnosis"] is None or isinstance(out[0]["diagnosis"], str)


class TestRealTokenizerTruncation:
    def test_hf_offsets_cut_on_token_boundaries(self):
        from dataengineer_spark.functions import truncate as tr

        _skip_if_unloadable(
            lambda: transformers.AutoTokenizer.from_pretrained(
                "bert-base-uncased", use_fast=True
            )
        )
        # force a fresh load so the HF branch (not a previously cached
        # regex fallback) serves this test
        tr._TOKENIZERS.pop("hf", None)
        text = "pathology " * 600  # > 510 BERT tokens either way
        kept, off = tr._truncate_one(text, "entire report", tr.TOKEN_LIMIT)
        assert off > 0 and text.endswith(kept)
        offs = tr._offsets(text)
        assert len(offs) > tr.TOKEN_LIMIT
        # reference dx_group.py:52-55: keep the LAST 510 tokens exactly
        assert off == offs[len(offs) - tr.TOKEN_LIMIT][0]
        kept_head, off_head = tr._truncate_one(text, "gross_or_micro", tr.TOKEN_LIMIT)
        assert text.startswith(kept_head)
        assert off_head == offs[tr.TOKEN_LIMIT - 1][1]
        tr._TOKENIZERS.pop("hf", None)  # leave no cross-test tokenizer state
