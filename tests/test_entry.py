"""Driver-contract smoke: entry() and the queries()/oracle_sql() registry.

Full oracle comparison runs via tools/check_oracle.py; here we pin the
contract shape and the flagship query.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


class TestContract:
    def test_every_oracle_has_a_query(self):
        qs, oracles = entrymod.queries(), entrymod.oracle_sql()
        assert set(oracles) <= set(qs)
        assert len(qs) >= 40

    def test_entry_runs_and_yields_rows(self, spark):
        df = entrymod.entry(spark)
        assert df.columns == [
            "batchid", "msgid", "predicted_label_id", "model_score", "model_id",
            "predicted_label",
        ]
        assert df.count() > 0

    def test_flagship_plan_has_no_shuffle_on_fact_side(self, spark):
        # broadcast dim join: the documents scan must not shuffle.
        # Inspect the flagship plan directly — entry() returns a
        # lineage_cut frame (one materialization shared by the K4
        # upload and the driver's collect) whose own plan is just the
        # checkpoint scan.
        plan = (
            entrymod._flagship(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan
