"""Datasets (reference ``python/dgl/data/``, 42 loaders).

Zero-egress note: loaders check ``raw_dir`` for real files and otherwise
generate deterministic synthetic graphs with the same schema
(``ds.is_synthetic`` tells you which you got).
"""
from .dgl_dataset import DGLDataset
from .citation import (
    CitationGraphDataset,
    CoraGraphDataset,
    CiteseerGraphDataset,
    PubmedGraphDataset,
)
from .misc_datasets import (
    KarateClubDataset,
    RedditDataset,
    PPIDataset,
    TUDataset,
    GINDataset,
    FB15k237Dataset,
    AIFBDataset,
    MUTAGDataset,
    CSVDataset,
    AsNodePredDataset,
    AsLinkPredDataset,
    AsGraphPredDataset,
)
from .extra_datasets import (
    CoraFullDataset,
    AmazonCoBuyComputerDataset,
    AmazonCoBuyPhotoDataset,
    CoauthorCSDataset,
    CoauthorPhysicsDataset,
    WikiCSDataset,
    FlickrDataset,
    YelpDataset,
    ActorDataset,
    SquirrelDataset,
    ChameleonDataset,
    CornellDataset,
    TexasDataset,
    WisconsinDataset,
    RomanEmpireDataset,
    AmazonRatingsDataset,
    MinesweeperDataset,
    TolokersDataset,
    QuestionsDataset,
    MiniGCDataset,
    SBMMixtureDataset,
    BAShapeDataset,
    BACommunityDataset,
    TreeCycleDataset,
    TreeGridDataset,
    CLUSTERDataset,
    PATTERNDataset,
    QM7bDataset,
    QM9Dataset,
    QM9EdgeDataset,
    ZINCDataset,
    MNISTSuperPixelDataset,
    CIFAR10SuperPixelDataset,
    FraudDataset,
    FraudYelpDataset,
    FraudAmazonDataset,
    BitcoinOTCDataset,
    GDELTDataset,
    ICEWS18Dataset,
    MovieLensDataset,
    BGSDataset,
    AMDataset,
    WN18Dataset,
    FB15kDataset,
)
from .generators import rand_graph, rand_bipartite
from .utils import split_dataset, Subset, save_graphs, load_graphs
