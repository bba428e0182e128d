"""ETL parity tests: log parsing, handler encodings, sentinel truncation."""

import numpy as np

from videocad_tpu.etl import (
    assemble_sequence,
    convert_logs_to_vectors,
    parse_log_line,
    truncate_at_sentinel,
)

SCALE_LINE = "Scale: 2.5"
LOG_LINE = (
    "1003 - INFO - finished move to. "
    "Absolute (Point(x=240, y=325)) "
    "Relative ((0.09854014598540146, 0.2950191570881226)) "
    "Args (<io_env.io_env.IOEnv object at 0x7f>, 'l')"
)


def _entry(action, status="finished", args=(), ts=10.0, rel=(0.5, 0.25)):
    return {
        "timestamp": ts,
        "status": status,
        "action": action,
        "absolute": {"x": 1, "y": 2},
        "relative": {"x": rel[0], "y": rel[1]},
        "args": list(args),
    }


def test_parse_scale_line():
    assert parse_log_line(SCALE_LINE) == {"scale": 2.5}


def test_parse_log_line_fields():
    log = parse_log_line(LOG_LINE)
    assert log["timestamp"] == 1003.0
    assert log["status"] == "finished"
    assert log["action"] == "move to"
    assert log["absolute"] == {"x": 240, "y": 325}
    assert abs(log["relative"]["x"] - 0.09854014598540146) < 1e-12
    assert log["args"] == ["l"]


def test_move_to_encoding_has_x_offset():
    logs = [{"scale": 2.0}, _entry("move to", rel=(0.1, 0.2)), _entry("click", ts=11.0)]
    vectors, timestamps = convert_logs_to_vectors(logs)
    assert vectors[0] == [0, 100 + 15, 200, -1, -1, -1, -1]
    assert timestamps == [10.0, 11.0]


def test_click_encoding():
    logs = [{"scale": 2.0}, _entry("click")]
    vectors, _ = convert_logs_to_vectors(logs)
    assert vectors == [[4, -1, -1, -1, -1, -1, -1]]


def test_press_keys_encoding_and_repeat_count():
    logs = [{"scale": 2.0}, _entry("press keys", args=["enter", "5", "x"])]
    vectors, _ = convert_logs_to_vectors(logs)
    # enter -> code 6 * 50 = 300; repeat (5-2)*200 = 600
    assert vectors == [[1, -1, -1, 300, 600, -1, -1]]


def test_press_keys_shift_chord():
    logs = [{"scale": 2.0}, _entry("hotkey", args=["shift", "s"])]
    vectors, _ = convert_logs_to_vectors(logs)
    # ('shift','s') -> 12 * 50 = 600; bare 's' not in KEY_MAP so no clash
    assert vectors == [[1, -1, -1, 600, -1, -1, -1]]


def test_press_keys_unmapped_key_is_dropped():
    logs = [{"scale": 2.0}, _entry("press keys", args=["zz"]), _entry("click")]
    vectors, _ = convert_logs_to_vectors(logs)
    assert vectors == [[4, -1, -1, -1, -1, -1, -1]]


def test_write_text_value_binning():
    logs = [{"scale": 2.0}, _entry("write text", args=["1.0"])]
    vectors, _ = convert_logs_to_vectors(logs)
    # int(1.0/2.0*499) + 500 = 749
    assert vectors == [[3, -1, -1, -1, -1, -1, 749]]


def test_write_text_clamps_to_999():
    logs = [{"scale": 0.5}, _entry("type", args=["10"])]
    vectors, _ = convert_logs_to_vectors(logs)
    assert vectors[0][6] == 999


def test_scroll_coalescing_keeps_last_timestamp():
    logs = [
        {"scale": 1.0},
        _entry("scroll", args=["1"], ts=1.0),
        _entry("scroll", args=["-3"], ts=2.0),
        _entry("click", ts=3.0),
        _entry("scroll", args=["2"], ts=4.0),
    ]
    vectors, timestamps = convert_logs_to_vectors(logs)
    assert vectors == [
        [2, -1, -1, -1, -1, 500, -1],
        [4, -1, -1, -1, -1, -1, -1],
        [2, -1, -1, -1, -1, 500, -1],
    ]
    assert timestamps == [2.0, 3.0, 4.0]


def test_key_up_down_shift_codes():
    logs = [
        {"scale": 1.0},
        _entry("key down", args=["shift"]),
        _entry("key up", args=["shift"]),
    ]
    vectors, _ = convert_logs_to_vectors(logs)
    assert vectors[0][3] == 50 * 18
    assert vectors[1][3] == 50 * 17


def test_trailing_move_to_keeps_unset_coordinates():
    # Reference quirk: a move-to with no following log entry keeps -1 x/y
    # (transform_dataset.py:96-100).
    logs = [{"scale": 1.0}, _entry("move to", rel=(0.1, 0.2))]
    vectors, _ = convert_logs_to_vectors(logs)
    assert vectors == [[0, -1, -1, -1, -1, -1, -1]]
    logs.append(_entry("click"))
    vectors, _ = convert_logs_to_vectors(logs)
    assert vectors[0] == [0, 115, 200, -1, -1, -1, -1]


def test_scroll_first_sequence_does_not_crash():
    # The reference IndexErrors when the first handled action is a scroll
    # (transform_dataset.py:239 peeks vectors[-1]); we handle it.
    logs = [{"scale": 1.0}, _entry("scroll", args=["2"])]
    vectors, _ = convert_logs_to_vectors(logs)
    assert vectors == [[2, -1, -1, -1, -1, 500, -1]]


def test_unfinished_entries_skipped():
    logs = [{"scale": 1.0}, _entry("click", status="started"), _entry("click")]
    vectors, _ = convert_logs_to_vectors(logs)
    assert len(vectors) == 1


def test_truncate_at_sentinel_keeps_sentinel_row():
    actions = np.full((5, 7), -1)
    actions[:, 0] = 1
    actions[3, 3] = 950
    frames = np.arange(5)
    out_actions, out_frames = truncate_at_sentinel(actions, frames)
    assert out_actions.shape[0] == 4
    np.testing.assert_array_equal(out_frames, [0, 1, 2, 3])


def test_assemble_sequence_prepends_zero_action():
    frames = np.arange(6).reshape(3, 1, 1, 2)
    actions = np.array([[0, 1, 2, 3, 4, 5, 6]] * 3)
    out_frames, out_actions, out_ts = assemble_sequence(frames, actions, [7.0, 8.0, 9.0])
    assert out_frames.shape[0] == 4
    np.testing.assert_array_equal(out_frames[0], out_frames[1])
    np.testing.assert_array_equal(out_actions[0], np.zeros(7))
    np.testing.assert_array_equal(out_ts, [7.0, 7.0, 8.0, 9.0])


def test_write_text_missing_scale_raises_clearly():
    """Reference quirk fixed-and-documented: a write_text entry without a
    scale header raised ZeroDivisionError (transform_dataset.py:160-173);
    here it names the offending entry."""
    import pytest
    logs = [{}, _entry("write text", args=["0.5"])]  # header lacks scale
    with pytest.raises(ValueError, match="no scale header"):
        convert_logs_to_vectors(logs)
