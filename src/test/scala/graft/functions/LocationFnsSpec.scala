package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** F6-F10 goldens from executing the reference's parse logic
  * (data_prepare.py:432-652, data_processing.py:6-69), including the
  * tests/test_staging_to_dwh.py:98-119 cases.
  */
class LocationFnsSpec extends AnyFunSuite {
  import LocationFns._

  test("parse_job_location golden cases") {
    assert(parseJobLocationImpl("[\"Hà Nội: Cầu Giấy, Đống Đa\"]") ==
      Seq(Loc(null, "Hà Nội", "Cầu Giấy"), Loc(null, "Hà Nội", "Đống Đa")))
    assert(parseJobLocationImpl("Đà Nẵng") == Seq(Loc(null, "Đà Nẵng", null)))
    assert(parseJobLocationImpl(null) == Seq(Loc(null, "Unknown", null)))
    assert(parseJobLocationImpl("") == Seq(Loc(null, "Unknown", null)))
    assert(parseJobLocationImpl("  ") == Seq(Loc(null, "Unknown", null)))
    assert(parseJobLocationImpl("[]") == Seq(Loc(null, "Unknown", null)))
    assert(parseJobLocationImpl("['Hà Nội: Cầu Giấy', 'TP.HCM']") ==
      Seq(Loc(null, "Hà Nội", "Cầu Giấy"), Loc(null, "TP.HCM", null)))
    assert(parseJobLocationImpl("Bình Định: TP Quy Nhơn") ==
      Seq(Loc("Bình Định", "TP Quy Nhơn", null)))
    assert(parseJobLocationImpl("Hà Nội │ Cầu Giấy") ==
      Seq(Loc(null, "Hà Nội", "Cầu Giấy")))
    assert(parseJobLocationImpl("Miền Bắc │ Hà Nội │ Hoàn Kiếm") ==
      Seq(Loc("Miền Bắc", "Hà Nội", "Hoàn Kiếm")))
    assert(parseJobLocationImpl("Hồ Chí Minh: Quận 1, Quận 3, TP Thủ Đức") ==
      Seq(Loc(null, "Hồ Chí Minh", "Quận 1"), Loc(null, "Hồ Chí Minh", "Quận 3"),
        Loc("Hồ Chí Minh", "TP Thủ Đức", null)))
  }

  test("extract_location_info strips tags and keeps key:value pairs") {
    assert(extractLocationInfoImpl("<div>Hà Nội: 123 ABC</div>") == Seq("Hà Nội: 123 ABC"))
    assert(extractLocationInfoImpl("<div>Hồ Chí Minh: 456 XYZ<br/>Đà Nẵng: 789 DEF</div>") ==
      Seq("Hồ Chí Minh: 456 XYZ", "Đà Nẵng: 789 DEF"))
    assert(extractLocationInfoImpl(null) == Seq.empty)
    assert(extractLocationInfoImpl("<p>Hà Nội:</p>") == Seq.empty)
    assert(extractLocationInfoImpl("<div><b>Huế</b>: Phú Vang</div>") == Seq("Huế"))
  }

  test("refine_location dedups city prefixes when '&' present") {
    assert(refineLocationImpl("Hồ Chí Minh & Đà Nẵng",
      Seq("Hồ Chí Minh: 456 XYZ", "Đà Nẵng: 789 DEF")) == "Hồ Chí Minh, Đà Nẵng")
    assert(refineLocationImpl("Hà Nội", Seq("Hà Nội: 123 ABC")) == "Hà Nội")
    assert(refineLocationImpl("A & B", Seq("X: 1", "X: 2", "Y")) == "X, Y")
    assert(refineLocationImpl("A & B", Seq.empty) == "A & B")
    assert(refineLocationImpl(null, Seq("X: 1")) == null)
  }

  test("extract_location_pairs_list prefers location_pairs, falls back to bar format") {
    assert(extractLocationPairsListImpl("[\"Hà Nội: Cầu Giấy\"]", null) ==
      Seq("Hà Nội: Cầu Giấy"))
    assert(extractLocationPairsListImpl(null, "Hà Nội │ Cầu Giấy, Đống Đa") ==
      Seq("Hà Nội:Cầu Giấy", "Hà Nội:Đống Đa"))
    assert(extractLocationPairsListImpl(null, "Đà Nẵng") == Seq("Đà Nẵng"))
    assert(extractLocationPairsListImpl(null, null) == Seq.empty)
  }

  test("parse_location_pair TP heuristic") {
    assert(parseLocationPairImpl("Bình Định:TP Quy Nhơn") == (("Bình Định", "TP Quy Nhơn", Seq.empty)))
    assert(parseLocationPairImpl("Hà Nội:Cầu Giấy, Đống Đa") ==
      ((null, "Hà Nội", Seq("Cầu Giấy", "Đống Đa"))))
    assert(parseLocationPairImpl("Huế") == ((null, "Huế", Seq.empty)))
  }
}
