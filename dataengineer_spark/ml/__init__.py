from dataengineer_spark.ml.inference import (
    standin_classifier,
    arith_standin_classifier,
    transformer_classifier,
    qa_sectionizer,
    constant_classifier,
)

__all__ = [
    "standin_classifier",
    "arith_standin_classifier",
    "transformer_classifier",
    "qa_sectionizer",
    "constant_classifier",
]
