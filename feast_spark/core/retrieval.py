"""RetrievalJob — the lazy handle on a pending historical query.

Parity with ``sdk/python/feast/infra/offline_stores/offline_store.py:
92-442`` (and the Spark impl at ``spark_offline_store/spark.py:978-1209``):
the query is NOT executed until a materializing method is called.

- to_spark_df()  -> the underlying lazy DataFrame (plan, no execution)
- to_df()        -> pandas (driver collect; Arrow path)
- to_arrow()     -> pyarrow.Table
- persist(path)  -> saved-dataset parquet (overwrite-guarded)
- to_remote_storage(dir) -> staged parquet files list (spark.py:1153-1201)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame

from feast_spark.sources.sinks import remote_storage_export, saved_dataset_persist


class RetrievalJob:
    def __init__(self, df: DataFrame):
        self._df = df

    def to_spark_df(self) -> DataFrame:
        return self._df

    def to_df(self) -> pd.DataFrame:
        return self._df.toPandas()

    def to_arrow(self) -> pa.Table:
        return pa.Table.from_pandas(self._df.toPandas(), preserve_index=False)

    def persist(
        self,
        path: str,
        allow_overwrite: bool = False,
        validation_reference=None,
    ) -> None:
        """Saved-dataset persist; with ``validation_reference`` (a
        :class:`feast_spark.operators.profile.DatasetProfile`) the result
        is validated FIRST and the write refused on failure — the
        reference's ``create_saved_dataset(validation_reference)`` gate
        (feature_store.py saved-dataset flow + saved_dataset.py:259)."""
        if validation_reference is not None:
            from feast_spark.operators.profile import validate_dataset

            report = validate_dataset(self._df, validation_reference)
            if not report.ok:
                raise ValueError(
                    "retrieval result failed validation; not persisting: "
                    + "; ".join(
                        f"{e.column}:{e.check} expected {e.expected} got {e.observed}"
                        for e in report.errors
                    )
                )
        saved_dataset_persist(self._df, path, allow_overwrite)

    def to_remote_storage(self, staging_dir: str) -> list[str]:
        return remote_storage_export(self._df, staging_dir)
