-- The reference's three saved Athena queries (sql/saved-queries.sql in
-- Grant-NBI/nbi-oedi-etl), translated to Spark SQL. The ONLY changes are
-- mechanical dialect fixes:
--   * Athena double-quoted identifiers ("in.state") -> Spark backticks (`in.state`)
--   * Glue table placeholders (${glue_db}.${prefix}_parquet / _state_ak)
--     -> catalog/view names (metadata_parquet / data_state_ak) registered via
--     nbi_oedi_etl_spark.sources.catalog or createOrReplaceTempView.
-- Everything else is byte-for-byte the reference SQL. Executed and
-- cross-checked against the engine's DataFrame builders in
-- tests/test_saved_queries_sql.py.

-- label: Total Number of Individual Building Models
-- description: Finds the total number of unique hospital building models in Ketchikan Gateway Borough, AK.
SELECT COUNT(DISTINCT m.bldg_id) AS total_buildings
FROM metadata_parquet AS m
    JOIN data_state_ak AS d ON m.bldg_id = d.bldg_id_min
WHERE m.`in.state` = 'AK'
    AND m.`in.county_name` = 'AK, Ketchikan Gateway Borough'
    AND m.`in.comstock_building_type` = 'Hospital';

-- label: Number of Buildings by Building Type Group
-- description: Segregates the building models by their type group and counts the number of unique buildings for each type group in Ketchikan Gateway Borough, AK.
SELECT m.`in.comstock_building_type_group`,
    COUNT(DISTINCT m.bldg_id) AS num_buildings
FROM metadata_parquet AS m
    JOIN data_state_ak AS d ON m.bldg_id = d.bldg_id_min
WHERE m.`in.state` = 'AK'
    AND m.`in.county_name` = 'AK, Ketchikan Gateway Borough'
GROUP BY m.`in.comstock_building_type_group`;

-- label: Isolated Individual Building Models
-- description: Retrieves up to 500 individual hospital building models for the Healthcare building type group, based on the input criteria in Ketchikan Gateway Borough, AK.
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
    AND rn <= 500;
