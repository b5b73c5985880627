from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from aws_cdk_pipelines_datalake_etl_spark.session import get_spark

SF_DIR_SMOKE = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    warehouse = tempfile.mkdtemp(prefix="spark-warehouse-")
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        warehouse_dir=warehouse,
    )
    yield s
    s.stop()
    shutil.rmtree(warehouse, ignore_errors=True)


@pytest.fixture()
def lake_root(tmp_path):
    return str(tmp_path / "lake")


YELLOW_HEADER = (
    "VendorID,tpep_pickup_datetime,tpep_dropoff_datetime,passenger_count,"
    "trip_distance,RatecodeID,store_and_fwd_flag,PULocationID,DOLocationID,"
    "payment_type,fare_amount,extra,mta_tax,tip_amount,tolls_amount,"
    "improvement_surcharge,total_amount,congestion_surcharge"
)

# Exercises (FIXTURES.md §1): null VendorID -> coalesce; all-empty
# congestion_surcharge -> NullType repair; one malformed row -> DROPMALFORMED.
YELLOW_ROWS = [
    "1,2020-08-01 10:00:00,2020-08-01 10:20:00,1,2.5,1,N,100,200,1,10.0,0.5,0.5,2.0,0.0,0.3,13.3,",
    "1,2020-08-01 11:00:00,2020-08-01 11:30:00,2,5.0,1,N,100,200,1,20.0,1.0,0.5,4.0,0.0,0.3,25.8,",
    ",2020-08-02 09:00:00,2020-08-02 09:10:00,1,1.0,1,Y,101,201,2,5.0,0.0,0.5,0.0,0.0,0.3,5.8,",
    "2,2020-08-02 12:00:00,2020-08-02 12:45:00,3,10.0,2,N,102,202,1,35.0,0.5,0.5,7.0,6.0,0.3,49.3,",
    "not,a,valid,row",
]


@pytest.fixture()
def yellow_csv(lake_root):
    """Write the yellow-taxi fixture CSV into the raw zone and return
    its raw-zone-relative key."""
    key = "tlc_taxi_data/yellow_taxi_trip_record/yellow_tripdata_2020-08.csv"
    path = os.path.join(lake_root, "raw", key)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(YELLOW_HEADER + "\n")
        f.write("\n".join(YELLOW_ROWS) + "\n")
    return key
