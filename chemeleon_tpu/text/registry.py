"""Text-encoder model registry (reference: chemeleon/text_encoder/__init__.py:1-17)."""

MODEL_NAMES = [
    "pranav-s/MaterialsBERT",
    "m3rg-iitd/matscibert",
    "lfoppiano/MatTPUSciBERT",
    "t5-3b",
    "meta-llama/Meta-Llama-3-8B-Instruct",
    "microsoft/Phi-3-mini-4k-instruct",
    "microsoft/phi-2",
    "chemeleon/clip-mp-composition",
    "chemeleon/clip-mp-composition_crystalsystem",
    "chemeleon/clip-mp-prompt",
    # TPU-native addition: offline element-fraction featurizer + trainable
    # MLP tower (text/composition.py) — no pretrained weights required
    "composition",
]

ARTIFACT_PATHS = {
    "chemeleon/clip-mp-composition": "hspark1212/Chemeleon_v0.1.1/model-hlfus38h:v1",
    "chemeleon/clip-mp-composition_crystalsystem": "hspark1212/Chemeleon_v0.1.1/model-b0xyc1sy:v1",
    "chemeleon/clip-mp-prompt": "hspark1212/Chemeleon_v0.1.1/model-upy53q4b:v1",
}
