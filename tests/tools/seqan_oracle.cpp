// Golden-fixture generator for alignment-kernel parity tests.
//
// Uses the SeqAn 2.4 headers vendored by the reference (a third-party
// header-only library, reference: core/includes-external/seqan) to compute,
// for pairs of sequences read from stdin (TSV: type<TAB>seqA<TAB>seqB):
//   dna:  the MyersBitVector global edit distance
//         (the reference DNA kernel, taxonpredictionmodelsequence.hh:133-171)
//   prot: the Blosum62+LinearGaps global alignment score AND the
//         match/mismatch/gap-column counts of SeqAn's traceback
//         (the reference protein kernel, taxonpredictionmodelsequence.hh:173-242)
// Output TSV: one line per input pair with the computed values, used as
// golden data by tests/test_ops_*.py.  Build: see tests/conftest.py.
#include <seqan/align.h>
#include <seqan/basic.h>
#include <iostream>
#include <sstream>
#include <string>

using namespace seqan;

int main() {
    std::string line;
    while (std::getline(std::cin, line)) {
        std::istringstream ss(line);
        std::string type, sa, sb;
        if (!std::getline(ss, type, '\t')) continue;
        std::getline(ss, sa, '\t');
        std::getline(ss, sb, '\t');
        if (type == "dna") {
            String<Dna5> a = sa.c_str(), b = sb.c_str();
            const String<Dna5>* lng = &a;
            const String<Dna5>* sht = &b;
            if (length(a) < length(b)) { lng = &b; sht = &a; }
            int dist = -globalAlignmentScore(*sht, *lng, MyersBitVector());
            std::cout << "dna\t" << dist << "\n";
        } else if (type == "prot") {
            String<AminoAcid> a = sa.c_str(), b = sb.c_str();
            Blosum62 sc;
            int self_ = globalAlignmentScore(a, a, sc, LinearGaps()) +
                        globalAlignmentScore(b, b, sc, LinearGaps());
            Align<String<AminoAcid>, ArrayGaps> aln;
            resize(rows(aln), 2);
            assignSource(row(aln, 0), a);
            assignSource(row(aln, 1), b);
            int mutual = globalAlignment(aln, sc, LinearGaps());
            auto& r0 = row(aln, 0);
            auto& r1 = row(aln, 1);
            auto it0 = begin(r0), e0 = end(r0);
            auto it1 = begin(r1);
            int gap = 0, match = 0, mismatch = 0;
            std::string tb;
            for (; it0 != e0; ++it0, ++it1) {
                if (isGap(it0)) { ++gap; tb += 'A'; }      // gap in row0 (A)
                else if (isGap(it1)) { ++gap; tb += 'B'; } // gap in row1 (B)
                else if (*it0 == *it1) { ++match; tb += 'M'; }
                else { ++mismatch; tb += 'X'; }
            }
            std::cout << "prot\t" << self_ << "\t" << mutual << "\t" << match
                      << "\t" << mismatch << "\t" << gap << "\t" << tb << "\n";
        }
    }
    return 0;
}
