"""S3 bulk [%FIELD%] text reader tests (format per
``DanawaBulkTextIndexer.java:32,91-135``)."""

import datetime


def test_bulk_text_reader(spark, tmp_path):
    f = tmp_path / "bulk.txt"
    f.write_text(
        "[%PRODUCTNAME%]삼성 노트북[%MAKER%]삼성전자[%REGISTERDATE%]20240131\n"
        "[%PRODUCTNAME%]LG 모니터[%MAKER%][%REGISTERDATE%]20230501\n"
        "this line has no field headers and is skipped\n"
        "[%PRODUCTNAME%]가방만 있는 줄\n",
        encoding="utf-8",
    )
    from mecab_ko_lucene_analyzer_spark.sources.bulk_text import read_bulk_text

    df = read_bulk_text(
        spark, str(f), ["PRODUCTNAME", "MAKER", "REGISTERDATE"]
    )
    rows = {r["PRODUCTNAME"]: r for r in df.collect()}
    assert set(rows) == {"삼성 노트북", "LG 모니터", "가방만 있는 줄"}
    assert rows["삼성 노트북"]["MAKER"] == "삼성전자"
    assert rows["삼성 노트북"]["REGISTERDATE"] == datetime.date(2024, 1, 31)
    assert rows["LG 모니터"]["MAKER"] is None  # empty value → null
    assert rows["가방만 있는 줄"]["MAKER"] is None
