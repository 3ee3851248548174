// Reference-code oracle for the taxator decision layer.
//
// This harness compiles the reference's OWN prediction models — above all
// RPAPredictionModel::predict() (reference:
// core/src/taxonpredictionmodelsequence.hh:326-881) — together with its
// real record parser, record-set generators, taxonomy, storages and GFF3
// writer, against the SeqAn headers the reference vendors, and runs them
// over a workload:
//   stdin : alignment TSV (the reference's 11+ column format)
//   stdout: GFF3 predictions, byte-for-byte what the reference taxator
//           binary's serial path would print
// The only non-reference code here is this argument-parsing main and the
// minimal header-only Boost shim (tests/tools/boost_shim) standing in
// for the Boost subset the headers include (tuple/format/lexical_cast/
// exception/filesystem/mutex), since Boost is not installed in this
// environment.  Test-only: used by tests/test_ref_oracle.py to diff the
// reference's decisions against taxtk's replay — nothing from here ships
// in the framework.
//
// Mirrors the wiring of core/taxator.cpp:50-78 (doPredictionsSerial) and
// :369-399 (model selection + execute<StringType>), without the thread
// pool, program_options, or whitelist paths.

#include <cstdlib>
#include <fstream>
#include <iostream>
#include <list>
#include <map>
#include <memory>
#include <string>
#include <vector>

#include "src/taxontree.hh"
#include "src/ncbidata.hh"
#include "src/alignmentrecord.hh"
#include "src/taxonpredictionmodelsequence.hh"
#include "src/taxonpredictionmodel.hh"
#include "src/constants.hh"
#include "src/sequencestorage.hh"
#include "src/predictionrecord.hh"
#include "src/accessconv.hh"
#include "src/fileparser.hh"
#include "src/exception.hh"

typedef std::list<AlignmentRecordTaxonomy*> RecordSetType;

struct Options {
    std::string mapping, queries, refs, query_index, ref_index;
    std::string algorithm = "rpa";
    std::string format = "nucleotide";
    std::string log_file;
    std::vector<std::string> ranks;
    float toppercent = 0.05f;
    float filterout = 0.5f;
    float minscore = 0.0f;
    unsigned minsupport = 1;
    double maxevalue = 1000.0;
    unsigned nbest = 1;
    bool split_alignments = true;
    bool alignments_sorted = false;
    bool delete_unmarked = true;
    bool ignore_unclassified = false;
};

// serial prediction loop — the reference's doPredictionsSerial
// (core/taxator.cpp:50-78) without the commented-out cleanup quirks
static void run_predictions(TaxonPredictionModel<RecordSetType>* predictor,
                            StrIDConverter& seqid2taxid, const Taxonomy* tax,
                            bool split_alignments, bool alignments_sorted,
                            std::ostream& logsink) {
    AlignmentRecordFactory<AlignmentRecordTaxonomy> fac(seqid2taxid, tax);
    FileParser<AlignmentRecordFactory<AlignmentRecordTaxonomy>> parser(
        std::cin, fac);
    std::unique_ptr<RecordSetGenerator<AlignmentRecordTaxonomy, RecordSetType>>
        recgen;
    if (alignments_sorted) {
        if (split_alignments)
            recgen.reset(new RecordSetGeneratorSorted<AlignmentRecordTaxonomy,
                                                      RecordSetType, true>(
                parser));
        else
            recgen.reset(new RecordSetGeneratorSorted<AlignmentRecordTaxonomy,
                                                      RecordSetType, false>(
                parser));
    } else {
        if (split_alignments)
            recgen.reset(
                new RecordSetGeneratorUnsorted<AlignmentRecordTaxonomy,
                                               RecordSetType, true>(parser));
        else
            recgen.reset(
                new RecordSetGeneratorUnsorted<AlignmentRecordTaxonomy,
                                               RecordSetType, false>(parser));
    }

    RecordSetType rset;
    PredictionRecord prec(tax);
    std::cout << GFF3Header();
    while (recgen->notEmpty()) {
        recgen->getNext(rset);
        predictor->predict(rset, prec, logsink);
        deleteRecords(rset);
        std::cout << prec;
    }
}

template <typename StringType>
static void execute_rpa(const Options& opt,
                        std::unique_ptr<Taxonomy>& tax,
                        StrIDConverter& seqid2taxid, std::ostream& logsink) {
    // storages exactly as the reference selects them (taxator.cpp:225-252)
    std::unique_ptr<RandomSeqStoreROInterface<StringType>> query_storage;
    if (opt.query_index.empty())
        query_storage.reset(
            new RandomInmemorySeqStoreRO<StringType, StringType>(opt.queries));
    else
        query_storage.reset(new RandomIndexedSeqstoreRO<StringType>(
            opt.queries, opt.query_index));

    std::unique_ptr<RandomSeqStoreROInterface<StringType>> db_storage;
    if (opt.ref_index.empty())
        db_storage.reset(
            new RandomInmemorySeqStoreRO<StringType, StringType>(opt.refs));
    else
        db_storage.reset(new RandomIndexedSeqstoreRO<StringType>(
            opt.refs, opt.ref_index));

    auto rpa =
        RPAPredictionModel<RecordSetType, RandomSeqStoreROInterface<StringType>,
                           RandomSeqStoreROInterface<StringType>, StringType>(
            tax.get(), *query_storage, *db_storage, opt.filterout,
            opt.toppercent);
    run_predictions(&rpa, seqid2taxid, tax.get(), opt.split_alignments,
                    opt.alignments_sorted, logsink);
}

static bool parse_bool(const std::string& v) { return v == "1" || v == "true"; }

int main(int argc, char** argv) {
    Options opt;
    for (int i = 1; i < argc; ++i) {
        std::string a = argv[i];
        auto next = [&]() -> std::string {
            if (i + 1 >= argc) {
                std::cerr << "missing value for " << a << std::endl;
                std::exit(2);
            }
            return argv[++i];
        };
        if (a == "--mapping") opt.mapping = next();
        else if (a == "--queries") opt.queries = next();
        else if (a == "--refs") opt.refs = next();
        else if (a == "--query-index") opt.query_index = next();
        else if (a == "--ref-index") opt.ref_index = next();
        else if (a == "--algorithm") opt.algorithm = next();
        else if (a == "--format") opt.format = next();
        else if (a == "--log") opt.log_file = next();
        else if (a == "--toppercent") opt.toppercent = std::stof(next());
        else if (a == "--filterout") opt.filterout = std::stof(next());
        else if (a == "--minscore") opt.minscore = std::stof(next());
        else if (a == "--minsupport") opt.minsupport = std::stoul(next());
        else if (a == "--maxevalue") opt.maxevalue = std::stod(next());
        else if (a == "--nbest") opt.nbest = std::stoul(next());
        else if (a == "--split") opt.split_alignments = parse_bool(next());
        else if (a == "--sorted") opt.alignments_sorted = parse_bool(next());
        else if (a == "--delete-notranks")
            opt.delete_unmarked = parse_bool(next());
        else if (a == "--ignore-unclassified") opt.ignore_unclassified = true;
        else if (a == "--ranks") {
            std::string csv = next(), item;
            for (char c : csv) {
                if (c == ',') {
                    opt.ranks.push_back(item);
                    item.clear();
                } else item += c;
            }
            if (!item.empty()) opt.ranks.push_back(item);
        } else {
            std::cerr << "unknown argument: " << a << std::endl;
            return 2;
        }
    }
    if (opt.ranks.empty()) opt.ranks = default_ranks;

    try {
        std::unique_ptr<Taxonomy> tax(
            loadTaxonomyFromEnvironment(&opt.ranks));
        if (!tax) return 1;
        if (opt.delete_unmarked) tax->deleteUnmarkedNodes();

        std::unique_ptr<StrIDConverter> seqid2taxid(
            loadStrIDConverterFromFile(opt.mapping, 1000));

        std::ofstream logfh;
        std::ostream* logsink = &logfh;
        if (opt.log_file.empty()) {
            logfh.open("/dev/null");
        } else {
            logfh.open(opt.log_file.c_str(), std::ios_base::app);
        }

        if (opt.algorithm == "rpa") {
            if (opt.format == "nucleotide")
                execute_rpa<seqan::String<seqan::Dna5>>(opt, tax, *seqid2taxid,
                                                        *logsink);
            else if (opt.format == "protein")
                execute_rpa<seqan::String<seqan::AminoAcid>>(
                    opt, tax, *seqid2taxid, *logsink);
            else {
                std::cerr << "bad --format" << std::endl;
                return 2;
            }
        } else if (opt.algorithm == "dummy") {
            auto m = DummyPredictionModel<RecordSetType>(tax.get());
            run_predictions(&m, *seqid2taxid, tax.get(), opt.split_alignments,
                            opt.alignments_sorted, *logsink);
        } else if (opt.algorithm == "simple-lca") {
            auto m = LCASimplePredictionModel<RecordSetType>(tax.get());
            run_predictions(&m, *seqid2taxid, tax.get(), opt.split_alignments,
                            opt.alignments_sorted, *logsink);
        } else if (opt.algorithm == "megan-lca" ||
                   opt.algorithm == "ic-megan-lca") {
            auto m = MeganLCAPredictionModel<RecordSetType>(
                tax.get(), opt.ignore_unclassified, opt.toppercent,
                opt.minscore, opt.minsupport, opt.maxevalue);
            run_predictions(&m, *seqid2taxid, tax.get(), opt.split_alignments,
                            opt.alignments_sorted, *logsink);
        } else if (opt.algorithm == "n-best-lca") {
            auto m = NBestLCAPredictionModel<RecordSetType>(tax.get(),
                                                            opt.nbest);
            run_predictions(&m, *seqid2taxid, tax.get(), opt.split_alignments,
                            opt.alignments_sorted, *logsink);
        } else {
            std::cerr << "unknown --algorithm " << opt.algorithm << std::endl;
            return 2;
        }
        return 0;
    } catch (Exception& e) {
        std::cerr << "reference-code error: " << e.what() << " ["
                  << boost::diagnostic_information(e) << "]" << std::endl;
        return 1;
    }
}
