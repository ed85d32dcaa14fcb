"""newAPIHadoopFile migration shim (reference Readme.md:110-131)."""

import pytest

from fourmc_spark.format import write_file
from fourmc_spark.hadoop_compat import new_api_hadoop_file, text_file_4mc


@pytest.fixture()
def mc_file(tmp_path):
    data = ("\n".join(f"line {i}" for i in range(50000)) + "\n").encode()
    p = str(tmp_path / "foo.4mc")
    write_file(p, data, codec="lz4", level="fast", block_size=64 * 1024)
    return p, data


def test_reference_recipe_shape(spark, mc_file):
    path, data = mc_file
    rdd = new_api_hadoop_file(
        spark, path,
        "com.fing.mapreduce.FourMcTextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
    )
    first = rdd.take(1)[0]
    assert first == (12, "line 0")  # offset = owning block (first = 12, after header)
    assert rdd.count() == 50000
    assert rdd.map(lambda kv: kv[1]).collect() == data.decode().splitlines()


def test_split_maxsize_conf_maps_to_partitions(spark, mc_file):
    path, _ = mc_file
    few = new_api_hadoop_file(spark, path).getNumPartitions()
    many = new_api_hadoop_file(
        spark, path,
        conf={"mapreduce.input.fileinputformat.split.maxsize": "65536"},
    ).getNumPartitions()
    assert many > few  # splittable: smaller max split -> more partitions


def test_unknown_input_format_rejected(spark, mc_file):
    path, _ = mc_file
    with pytest.raises(ValueError, match="unsupported input format"):
        new_api_hadoop_file(spark, path, "org.example.SomeOtherInputFormat")


def test_text_file_twin(spark, mc_file):
    path, data = mc_file
    rdd = text_file_4mc(spark, path, maxpartitionbytes=65536)
    assert rdd.getNumPartitions() > 1  # the README's complaint about textFile
    assert rdd.count() == 50000
