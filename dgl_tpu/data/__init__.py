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
from .compat import (
    get_download_dir,
    makedirs,
    check_sha1,
    download,
    extract_archive,
    is_local_path,
    check_local_file_exists,
    idx2mask,
    generate_mask_tensor,
    save_info,
    load_info,
    save_tensors,
    load_tensors,
    add_nodepred_split,
    add_node_property_split,
    mask_nodes_by_property,
    deprecate_property,
    deprecate_function,
    deprecate_class,
    BA2MotifDataset,
    CoraBinary,
    FakeNewsDataset,
    SSTDataset,
    SST,
    PeptidesFunctionalDataset,
    PeptidesStructuralDataset,
    VOCSuperpixelsDataset,
    COCOSuperpixelsDataset,
    load_cora,
    load_citeseer,
    load_pubmed,
    load_data,
    sbm,
    eliminate_self_loops,
    loadtxt,
    negative_sample,
    tensor_dict_to_ndarray_dict,
    check_pytorch,
)
from .misc_datasets import _EntityDataset as RDFGraphDataset

# reference short-name / family aliases
CoraFull = CoraFullDataset
KarateClub = KarateClubDataset
AmazonCoBuy = AmazonCoBuyComputerDataset
Coauthor = CoauthorCSDataset
Entity = RDFGraphDataset
KnowledgeGraphDataset = FB15k237Dataset
LegacyTUDataset = TUDataset
LegacyPPIDataset = PPIDataset
GNNBenchmarkDataset = PATTERNDataset
SuperPixelDataset = MNISTSuperPixelDataset
GeomGCNDataset = ChameleonDataset
HeterophilousGraphDataset = RomanEmpireDataset
DGLBuiltinDataset = DGLDataset
