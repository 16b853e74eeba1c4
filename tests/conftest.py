import os

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "2g")
        .appName("piglet-spark-tests")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pigdata")
    (d / "t.csv").write_text("1,2,3\n4,5,6\n7,8,9\n1,2,4\n")
    (d / "nested.csv").write_text("AA,sym1\nAA,sym2\nAA,sym1\nBB,sym3\n")
    (d / "mary.txt").write_text(
        "Mary had a little lamb\nits fleece was white as snow\n"
        "and everywhere that Mary went\nthe lamb was sure to go\n"
    )
    (d / "dup.csv").write_text("1,1\n1,1\n2,2\n")
    (d / "person.tsv").write_text("anna\t21\nbob\t35\ncarl\t17\n")
    (d / "triples.nt").write_text(
        '<a> <knows> <b> .\n<b> <knows> <c> .\n<a> <age> "30" .\n'
        '<b> <age> "25" .\n'
    )
    (d / "js.json").write_text(
        '{"name":"Hage","address":{"city":"Ilmenau","zipcode":"98693"}}\n'
        '{"name":"Meier","address":{"city":"Erfurt","zipcode":"99084"}}\n'
    )
    return d


def rows(env_df):
    return sorted(tuple(r) for r in env_df.collect())
