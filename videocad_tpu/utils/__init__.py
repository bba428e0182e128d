from videocad_tpu.utils.io import (  # noqa: F401
    load_json,
    load_pickle,
    open_file,
    save_json,
    save_pickle,
)
