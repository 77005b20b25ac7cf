from nbi_oedi_etl_spark.functions.scalars import (
    dotted,
    floor_to_hour,
    key_fingerprint,
    upgrade_str,
)

__all__ = ["dotted", "floor_to_hour", "key_fingerprint", "upgrade_str"]
