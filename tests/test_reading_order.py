from pdf_to_text_ray.stages.reading_order import Run, document_text, page_text


def test_lines_sorted_top_to_bottom():
    runs = [Run(50, 700, "second"), Run(50, 714, "first"), Run(50, 686, "third")]
    assert page_text(runs) == "first\nsecond\nthird"


def test_runs_within_line_sorted_by_x_joined_by_space():
    runs = [Run(120, 700, "world"), Run(50, 700, "hello")]
    assert page_text(runs) == "hello world"


def test_y_tolerance_clusters_one_line():
    runs = [Run(50, 700.0, "a"), Run(80, 698.5, "b"), Run(110, 701.0, "c")]
    assert page_text(runs) == "a b c"


def test_two_columns_left_first():
    left = [Run(50, 714, "L1"), Run(50, 700, "L2"), Run(50, 686, "L3")]
    right = [Run(340, 714, "R1"), Run(340, 700, "R2")]
    # emission order interleaved/reversed must not matter
    runs = [right[0], left[2], right[1], left[0], left[1]]
    assert page_text(runs) == "L1\nL2\nL3\nR1\nR2"


def test_small_gap_is_not_a_column_split():
    runs = [Run(50, 714, "a"), Run(160, 714, "b"),
            Run(50, 700, "c"), Run(160, 700, "d")]
    # gap 110 < 150 → same column, two lines
    assert page_text(runs) == "a b\nc d"


def test_single_line_on_one_side_is_not_a_column():
    runs = [Run(50, 714, "head"), Run(400, 714, "pageno"),
            Run(50, 700, "body text")]
    # right side has only 1 line → no split; pageno joins line 1
    assert page_text(runs) == "head pageno\nbody text"


def test_empty_and_blank_runs():
    assert page_text([]) == ""
    assert page_text([Run(0, 0, "")]) == ""


def test_stable_tiebreak_same_position():
    runs = [Run(50, 700, "a"), Run(50, 700, "b")]
    assert page_text(runs) == "a b"


def test_pages_joined_with_newline():
    pages = [[Run(50, 700, "p1")], [], [Run(50, 700, "p3")]]
    assert document_text(pages) == "p1\n\np3"
