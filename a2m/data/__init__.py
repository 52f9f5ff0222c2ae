from a2m.data import (diagnose, hdf5_io, normalization, pose_codec,
                      synthetic, windowing)
from a2m.data.dataset import (DATACONFIG_FIELD_MAP, AlternateClassSampler,
                              BalanceClassSampler, Batcher, ConcatIntervals,
                              DataLoader, Data_Loader, IntervalData,
                              RandomSampler, SequentialSampler,
                              SubsetRandomSampler, WeightedRandomSampler,
                              loader_from_config, read_text_meta)
from a2m.data.modalities import (MOD_MAP, SPEAKERS, Audio, Modality,
                                 Skeleton2D, Text, load_modality_classes,
                                 pad_ragged, read_master_csv)
from a2m.data.normalization import (denormalize_pose, get_mean_std,
                                    get_mean_std_necksub, neck_subtract,
                                    normalize_pose)
from a2m.data.synthetic import make_synthetic_pats
from a2m.data.windowing import WindowIndex, window_index

__all__ = [
    'diagnose', 'hdf5_io', 'normalization', 'pose_codec', 'synthetic',
    'windowing',
    'AlternateClassSampler', 'BalanceClassSampler', 'Batcher',
    'ConcatIntervals', 'DataLoader', 'Data_Loader', 'IntervalData',
    'RandomSampler', 'SequentialSampler', 'SubsetRandomSampler',
    'WeightedRandomSampler', 'MOD_MAP', 'SPEAKERS', 'Audio', 'Modality',
    'Skeleton2D', 'Text', 'load_modality_classes', 'pad_ragged',
    'read_master_csv', 'denormalize_pose', 'get_mean_std',
    'get_mean_std_necksub', 'neck_subtract', 'normalize_pose',
    'make_synthetic_pats', 'WindowIndex', 'window_index',
    'DATACONFIG_FIELD_MAP', 'loader_from_config', 'read_text_meta',
]
