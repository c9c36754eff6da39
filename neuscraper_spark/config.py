"""Pipeline constants.

Mirrors the reference's fixed geometry (cited file:line are relative to
/root/reference):

- CHUNK_SIZE = 384 nodes per chunk        (src/warc/build.py:21, src/scraper/arguments.py:30)
- PREP_MAX_TOKEN_LEN = 50 ids per node at preprocessing (src/warc/build.py:22)
- MODEL_MAX_TOKEN_LEN = 5: model consumes first 4 subword ids + EOS (src/scraper/processing.py:50, arguments.py:32)
- NUM_CLASSES = 6 heads: Primary/Heading/Title/Paragraph/Table/List (arguments.py:31, AnnotateHtml_pb2 enum)
- PRIMARY_THRESHOLD = 0.9                 (src/scraper/commoncrawl.py:134, app/extractor.py:130)
- THRESHOLD_SWEEP                         (src/scraper/inference.py:78)
- PAD_ID=1, EOS_ID=2                      (src/scraper/processing.py:50-51)
- STRIP_CHARS: the byte-identity-defining strip charset (src/warc/build.py:85)
- SEQ_ELEMENT_TAGS: element nodes included in the model sequence
  alongside text nodes (src/warc/build.py:91)
- INFERENCE_BATCH = 256 chunks            (src/scraper/commoncrawl.py:84)
"""

CHUNK_SIZE = 384
PREP_MAX_TOKEN_LEN = 50
MODEL_MAX_TOKEN_LEN = 5
NUM_CLASSES = 6
PRIMARY_THRESHOLD = 0.9
THRESHOLD_SWEEP = (0.1, 0.25, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
PAD_ID = 1
EOS_ID = 2
BOS_ID = 0
STRIP_CHARS = "\r\n\t\xa0 "
SEQ_ELEMENT_TAGS = ("ol", "dl", "table")
TASKS = ("Primary", "Heading", "Title", "Paragraph", "Table", "List")
INFERENCE_BATCH = 256

# Scores are quantized to this many decimals before thresholding so a
# sub-ULP float32 reduction-order difference can never flip a keep/drop
# decision between batch shapes / executor counts (SURVEY.md §7 hard part 2).
SCORE_DECIMALS = 4

# Model geometry (scaled-down but same topology as the reference:
# token-encoder -> pooler -> text_in->text linear -> pos-enc ->
# node-level transformer encoder -> per-node MLP -> sigmoid;
# src/scraper/model.py:49-124). Reference uses 768/256/3 layers/8 heads
# over a 250k-piece vocabulary; we default smaller for CPU serving —
# sized so the per-worker embedding table (VOCAB*DIM*4 = 2 MB) stays
# cache-resident: at 50k x 128 the gather thrashed shared L3 across 32
# workers and the scorer stopped scaling past ~8 processes (measured).
VOCAB_SIZE = 8_192
TEXT_IN_EMB_DIM = 64    # reference: 768 (XLMR pooler)
TEXT_EMB_DIM = 64       # reference: 256
NODE_LAYERS = 2         # reference: 3
NODE_HEADS = 4          # reference: 8
MODEL_SEED = 42

# cache-invalidation tag for node-shared weight mmaps (model.shm_cache_weights)
WEIGHTS_TAG = f"{MODEL_SEED}-{VOCAB_SIZE}-{TEXT_IN_EMB_DIM}-{TEXT_EMB_DIM}-{NODE_LAYERS}-{NODE_HEADS}"
