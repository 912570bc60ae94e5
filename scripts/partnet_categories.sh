# The 17 PartNet categories with level-3 annotations, shared by the
# training/testing/extraction loop scripts (source this file; do not copy the
# list — five copies drifted before this existed). The canonical table lives
# in `csn_tpu/data/partnet.py` (CATEGORIES / NUM_TRAIN, verified against
# `MinkowskiNet/lib/datasets/partnet.py`); TRAIN_COUNTS here must stay
# index-aligned with CATEGORIES (training_csn.sh derives STAT_FREQ from it).
CATEGORIES=(Bed Bottle Chair Clock Dishwasher Display Door Earphone Faucet \
            Knife Lamp Microwave Refrigerator StorageFurniture Table \
            TrashCan Vase)
TRAIN_COUNTS=(133 315 4489 406 111 633 149 147 435 221 1554 133 136 1588 \
              5707 221 741)
