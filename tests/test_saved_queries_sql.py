"""Entry-point-3 parity (SURVEY.md §3.3): the reference's three saved Athena
queries (sql/saved-queries.sql) run through ``spark.sql`` on registered views
with ONLY the mechanical dialect change — Athena's ``"quoted.identifiers"``
become Spark backticks, the Glue table placeholders become view names.
Results must agree with the engine's DataFrame builders (operators/queries.py)
on the same data, proving a reference user can paste their saved queries.

The dotted column names are load-bearing (SURVEY.md §7.4.1).
"""

from __future__ import annotations

import pandas as pd
import pytest

from nbi_oedi_etl_spark.operators import queries as qops

# Athena → Spark SQL: "in.col" → `in.col`; ${glue_db}.${prefix}_parquet → m /
# ${prefix}_state_ak → d. Everything else is byte-for-byte ANSI.
Q1_SQL = """
SELECT COUNT(DISTINCT m.bldg_id) AS total_buildings
FROM metadata_parquet AS m
    JOIN data_state_ak AS d ON m.bldg_id = d.bldg_id_min
WHERE m.`in.state` = 'AK'
    AND m.`in.county_name` = 'AK, Ketchikan Gateway Borough'
    AND m.`in.comstock_building_type` = 'Hospital'
"""

Q2_SQL = """
SELECT m.`in.comstock_building_type_group`,
    COUNT(DISTINCT m.bldg_id) AS num_buildings
FROM metadata_parquet AS m
    JOIN data_state_ak AS d ON m.bldg_id = d.bldg_id_min
WHERE m.`in.state` = 'AK'
    AND m.`in.county_name` = 'AK, Ketchikan Gateway Borough'
GROUP BY m.`in.comstock_building_type_group`
"""

Q3_SQL = """
WITH filtered_buildings AS (
    SELECT DISTINCT m.bldg_id,
        m.`in.comstock_building_type_group`,
        ROW_NUMBER() OVER (
            PARTITION BY m.`in.comstock_building_type_group`
            ORDER BY m.bldg_id
        ) AS rn
    FROM metadata_parquet AS m
        JOIN data_state_ak AS d ON m.bldg_id = d.bldg_id_min
    WHERE m.`in.state` = 'AK'
        AND m.`in.county_name` = 'AK, Ketchikan Gateway Borough'
)
SELECT DISTINCT bldg_id,
    `in.comstock_building_type_group`
FROM filtered_buildings
WHERE `in.comstock_building_type_group` = 'Healthcare'
    AND rn <= 500
"""

COUNTY = "AK, Ketchikan Gateway Borough"


@pytest.fixture(scope="module")
def athena_views(spark):
    meta = pd.DataFrame(
        {
            "bldg_id": [1, 2, 3, 4, 5, 6],
            "in.state": ["AK"] * 5 + ["CA"],
            "in.county_name": [COUNTY] * 4 + ["AK, Nome Census Area", COUNTY],
            "in.comstock_building_type": [
                "Hospital", "Hospital", "School", "Outpatient", "Hospital", "Hospital",
            ],
            "in.comstock_building_type_group": [
                "Healthcare", "Healthcare", "Education", "Healthcare",
                "Healthcare", "Healthcare",
            ],
        }
    )
    # hourly fact: several rows per building (bldg 5 absent → join-filtered)
    data = pd.DataFrame({"bldg_id_min": [1, 1, 2, 3, 4, 6], "hour_val": range(6)})
    spark.createDataFrame(meta).createOrReplaceTempView("metadata_parquet")
    spark.createDataFrame(data).createOrReplaceTempView("data_state_ak")
    yield spark
    spark.catalog.dropTempView("metadata_parquet")
    spark.catalog.dropTempView("data_state_ak")


def test_q1_sql_matches_builder(athena_views):
    spark = athena_views
    sql_val = spark.sql(Q1_SQL).first()["total_buildings"]
    built = qops.count_distinct_joined(
        spark.table("metadata_parquet"),
        spark.table("data_state_ak"),
        "bldg_id",
        "bldg_id_min",
        filters={
            "in.state": "AK",
            "in.county_name": COUNTY,
            "in.comstock_building_type": "Hospital",
        },
    ).first()["total_buildings"]
    assert sql_val == built == 2  # bldg 1,2 (5 has no data; 6 is CA)


def test_q2_sql_matches_builder(athena_views):
    spark = athena_views
    sql_rows = {
        r["in.comstock_building_type_group"]: r["num_buildings"]
        for r in spark.sql(Q2_SQL).collect()
    }
    built = {
        r["in.comstock_building_type_group"]: r["total_buildings"]
        for r in qops.grouped_count_distinct_joined(
            spark.table("metadata_parquet"),
            spark.table("data_state_ak"),
            "bldg_id",
            "bldg_id_min",
            "in.comstock_building_type_group",
            filters={"in.state": "AK", "in.county_name": COUNTY},
        ).collect()
    }
    # Q2 filters only state+county (no building-type filter): Healthcare
    # keeps bldg 1,2,4; Education keeps bldg 3.
    assert sql_rows == built == {"Healthcare": 3, "Education": 1}


def test_q3_sql_matches_builder(athena_views):
    spark = athena_views
    sql_rows = sorted(
        (r["bldg_id"], r["in.comstock_building_type_group"])
        for r in spark.sql(Q3_SQL).collect()
    )
    built = qops.topk_per_group_joined(
        spark.table("metadata_parquet")
        .where("`in.state` = 'AK'")
        .where(f"`in.county_name` = '{COUNTY}'"),
        spark.table("data_state_ak"),
        "bldg_id",
        "bldg_id_min",
        "in.comstock_building_type_group",
        k=500,
        group_value="Healthcare",
    )
    built_rows = sorted(
        (r["bldg_id"], r["in.comstock_building_type_group"])
        for r in built.select("bldg_id", "`in.comstock_building_type_group`").collect()
    )
    assert sql_rows == built_rows == [(1, "Healthcare"), (2, "Healthcare"), (4, "Healthcare")]
