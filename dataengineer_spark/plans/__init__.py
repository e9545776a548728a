from dataengineer_spark.plans.dx_group import run_dx_group
from dataengineer_spark.plans.api_variant import run_dx_group_api
from dataengineer_spark.plans.prostate import run_prostate

__all__ = ["run_dx_group", "run_dx_group_api", "run_prostate"]
