"""Task layer — sampling + labels + loss + metrics per downstream task.

Rebuilds the reference's four experiment scripts as library tasks
(SURVEY.md §2 #16-19):

- :class:`NodeClassificationTask` — paper-field (multi-label KL,
  ``/root/reference/OAG/train_paper_field.py``) and paper-venue
  (single-label NLL, ``OAG/train_paper_venue.py``)
- :class:`OgbnNodeTask` — ogbn-mag with split masks gathered per subgraph
  (``ogbn-mag/train_ogbn_mag.py``)
- :class:`LinkPredictionTask` — author disambiguation with grouped
  listwise softmax (``OAG/train_author_disambiguation.py``)
"""

from pyhgt_tpu.tasks.base import TimeSplit, build_time_split_pairs, TaskBatch
from pyhgt_tpu.tasks.node_classification import NodeClassificationTask
from pyhgt_tpu.tasks.ogbn import OgbnNodeTask
from pyhgt_tpu.tasks.link_prediction import LinkPredictionTask
from pyhgt_tpu.tasks.evaluate import multi_sample_eval

__all__ = [
    "multi_sample_eval",
    "TimeSplit",
    "build_time_split_pairs",
    "TaskBatch",
    "NodeClassificationTask",
    "OgbnNodeTask",
    "LinkPredictionTask",
]
