"""End-to-end tests for the ETL CLI (cli/generate_dataset.py): the runnable
counterpart of the reference's ``python generate_dataset.py``
(/root/reference/generate_dataset.py:206-209) and ``python
transform_dataset.py`` (/root/reference/transform_dataset.py:386-389)."""

import pickle

import numpy as np
import pytest

from videocad_tpu.cli.generate_dataset import main as etl_main

cv2 = pytest.importorskip("cv2")

LOG_LINES = [
    "Scale: 2.0",
    "10 - INFO - finished move to. Absolute (Point(x=1, y=2)) "
    "Relative ((0.1, 0.2)) Args (<obj at 0x1>, 'l')",
    "20 - INFO - finished click. Absolute (Point(x=1, y=2)) "
    "Relative ((0.1, 0.2)) Args (<obj at 0x1>)",
    # end sentinel: press keys ('shift','7') -> code 19*50=950 at idx 3
    "30 - INFO - finished press keys. Absolute (Point(x=1, y=2)) "
    "Relative ((0.1, 0.2)) Args (<obj at 0x1>, 'shift', '7')",
]


def _write_raw_tree(tmp_path, file_id="12345"):
    raw = tmp_path / "raw"
    (raw / "mouse").mkdir(parents=True)
    (raw / "videos").mkdir()
    img_dir = raw / "images" / file_id[:4]
    img_dir.mkdir(parents=True)
    (raw / "mouse" / f"{file_id}.log").write_text("\n".join(LOG_LINES))

    cv2.imwrite(str(img_dir / f"{file_id}_0.png"),
                np.full((64, 64, 3), 200, np.uint8))

    video_path = raw / "videos" / f"{file_id}.avi"
    writer = cv2.VideoWriter(str(video_path),
                             cv2.VideoWriter_fourcc(*"MJPG"), 30, (48, 48))
    assert writer.isOpened(), "cv2 VideoWriter failed to open"
    for i in range(40):
        writer.write(np.full((48, 48, 3), i * 6 % 255, np.uint8))
    writer.release()
    return raw


def test_generate_stage_writes_sharded_store_and_vcb(tmp_path):
    raw = _write_raw_tree(tmp_path)
    out = tmp_path / "store"
    vcb = tmp_path / "vcb"
    rc = etl_main(["--raw_dir", str(raw), "--out_dir", str(out),
                   "--resize", "32", "32", "--vcb_dir", str(vcb)])
    assert rc == 0

    pkl = out / "1234" / "12345_data.pkl"
    assert pkl.exists()
    assert (out / "1234" / "12345_frame.png").exists()
    with open(pkl, "rb") as f:
        data = pickle.load(f)
    # 3 log actions + the prepended zero action (generate_dataset.py:180-183)
    assert data["actions"].shape == (4, 7)
    assert data["frames"].shape[0] == 4
    assert data["frames"].shape[1:3] == (32, 32)
    assert (data["actions"][0] == 0).all()
    assert data["actions"][-1, 3] == 950  # sentinel row kept

    from videocad_tpu.data.native import scan_vcb
    assert len(scan_vcb(str(vcb / "all"))) == 1


def test_transform_stages(tmp_path):
    log_dir = tmp_path / "mouse"
    log_dir.mkdir()
    (log_dir / "0001.log").write_text("\n".join(LOG_LINES))
    json_dir = tmp_path / "json"
    vec_dir = tmp_path / "vec"

    rc = etl_main(["--stage", "logs_to_json", "--source_dir", str(log_dir),
                   "--target_dir", str(json_dir)])
    assert rc == 0
    assert (json_dir / "0001.json").exists()

    rc = etl_main(["--stage", "json_to_vectors", "--source_dir",
                   str(json_dir), "--target_dir", str(vec_dir)])
    assert rc == 0
    with open(vec_dir / "0001.pkl", "rb") as f:
        actions, timesteps = pickle.load(f)
    assert actions.shape == (3, 7)
    assert actions[-1, 3] == 950
    assert (vec_dir / "0001.csv").exists()


def test_stage_arg_validation(tmp_path, capsys):
    with pytest.raises(SystemExit):
        etl_main(["--stage", "logs_to_json"])  # missing dirs
