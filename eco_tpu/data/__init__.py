from eco_tpu.data.video_list import VideoRecord, parse_video_list
from eco_tpu.data.sampler import (
    frame_indices,
    sample_offsets,
    streaming_allocation,
    subsample_window,
)
from eco_tpu.data.reader import read_segment_flow, read_segment_rgb
from eco_tpu.data.transform import (
    TransformConfig,
    fill_crop_sizes,
    fill_fix_offsets,
    sample_random_crop_size,
    transform_stack,
)
from eco_tpu.data.pipeline import VideoDataConfig, VideoPipeline
from eco_tpu.data.window import WindowSource, crop_window, parse_window_file
from eco_tpu.data.seg import SegSource, parse_seg_list, transform_seg
from eco_tpu.data.leveldb import (
    LevelDBReader,
    LevelDBSource,
    open_db,
    sniff_backend,
)
from eco_tpu.data.lmdb import (
    Datum,
    DatumBatchSource,
    LMDBReader,
    LMDBSource,
    parse_datum,
)
from eco_tpu.data.device_prefetch import prefetch_to_device
