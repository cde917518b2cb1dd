import numpy as np
import pytest

from fspann_query_system_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fspann-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def clustered(spark):
    """Deterministic clustered vectors (dim=16, 8 clusters, N=2000) so LSH
    recall is meaningfully above random (FIXTURES.md §1 guidance)."""
    rng = np.random.default_rng(42)
    centers = rng.normal(0, 5.0, (8, 16))
    X = np.vstack([c + rng.normal(0, 0.6, (250, 16)) for c in centers])
    rows = [(i, X[i].tolist()) for i in range(len(X))]
    df = spark.createDataFrame(rows, "id LONG, vector ARRAY<DOUBLE>").persist()
    df.count()
    return df, X


@pytest.fixture(scope="session")
def embeddings(spark):
    from pyspark.sql import functions as F
    return (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector")))
