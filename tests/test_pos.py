"""PosId/Pos unit tests (port of ``PosIdManagerTest.java:24-31`` plus
edge cases the reference exercises implicitly)."""

from mecab_ko_lucene_analyzer_spark.analysis import Pos, PosId


def test_convert_from_tag_string():
    assert PosId.from_tag("NNG") is PosId.NNG
    assert PosId.from_tag("InvalidTagString") is PosId.UNKNOWN


def test_josa_and_eomi_grouping():
    # every J* collapses to J; E* (except bare "E") collapses to E
    assert PosId.from_tag("JKS") is PosId.J
    assert PosId.from_tag("JX") is PosId.J
    assert PosId.from_tag("ETM") is PosId.E
    assert PosId.from_tag("EF") is PosId.E
    assert PosId.from_tag("EP") is PosId.E
    # quirk preserved from PosIdManager.java:100 (charAt(1) on "E" throws)
    assert PosId.from_tag("E") is PosId.UNKNOWN
    assert PosId.from_tag("") is PosId.UNKNOWN


def test_from_num_inflect_range():
    assert PosId.from_num(150) is PosId.NNG
    assert PosId.from_num(250) is PosId.INFLECT
    assert PosId.from_num(9999) is PosId.UNKNOWN


def test_compound_position_length_from_expression():
    p = Pos.from_node("삼성전자", "NNP,*,F,삼성전자,Compound,*,*,삼성/NNG/*+전자/NNG/*", 0, 0)
    assert p.pos_id is PosId.COMPOUND
    assert p.position_length == 2
    assert p.start_pos_id is PosId.NNG and p.end_pos_id is PosId.NNG


def test_token_string_va_vv():
    p = Pos.from_node("피", "VV,*,F,피,*,*,*,*", 0, 0)
    assert p.token_string() == "피/VV"
    q = Pos.from_node("꽃", "NNG,*,T,꽃,*,*,*,*", 0, 0)
    assert q.token_string() == "꽃"
