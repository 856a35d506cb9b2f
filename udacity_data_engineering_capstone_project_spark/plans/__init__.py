from udacity_data_engineering_capstone_project_spark.plans.star import (
    build_dimension,
    build_fact,
)

__all__ = ["build_dimension", "build_fact"]
